#!/usr/bin/env python
"""Materialize small REAL media binaries for the stdlib-codec unit tests:
tests/fixtures/media/{tone.wav, gradient.ppm}. Deterministic (pure math),
stdlib-only; committed once so CI decodes real bytes through the Arrow path.
"""

from __future__ import annotations

import io
import math
import struct
import wave
from pathlib import Path

OUT = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "media"

RATE, N_FRAMES, FREQ, AMP = 8000, 400, 440.0, 30000


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    # mono 16-bit PCM sine tone, 400 frames @ 8 kHz
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(RATE)
        frames = b"".join(
            struct.pack("<h", int(AMP * math.sin(2 * math.pi * FREQ * i / RATE)))
            for i in range(N_FRAMES)
        )
        w.writeframes(frames)
    (OUT / "tone.wav").write_bytes(buf.getvalue())

    # 8x6 binary PPM with a comment line; R ramps left->right, G ramps
    # top->bottom, B constant 8
    width, height = 8, 6
    header = f"P6\n# synthetic gradient\n{width} {height}\n255\n".encode()
    raster = bytes(
        v
        for y in range(height)
        for x in range(width)
        for v in (x * 32, y * 40, 8)
    )
    (OUT / "gradient.ppm").write_bytes(header + raster)
    print(f"wrote {OUT}/tone.wav ({(OUT / 'tone.wav').stat().st_size} B), "
          f"gradient.ppm ({(OUT / 'gradient.ppm').stat().st_size} B)")


if __name__ == "__main__":
    main()
