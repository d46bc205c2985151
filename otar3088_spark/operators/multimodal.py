"""Multimodal column plumbing — binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. Three decoder modes behind one injectable seam:
a REAL stdlib codec pair (16-bit PCM WAV via ``wave``; binary PPM via its
ASCII header — ``stdlib_decode``, exercised in CI on committed binary
fixtures), a deterministic hash-derived fake (plumbing-only exercise), and
``codec=`` injection for PIL/torchaudio/av in real deployments. Formats the
stdlib cannot parse raise NotImplementedError at the seam.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = repeated hash bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media_{i}".encode()).digest() * 4
        kind = ("image", "audio", "video")[i % 3]
        rows.append((f"m_{i:04d}", kind, bytearray(payload), (f"{kind}/fake", len(payload), "synth")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def stdlib_decode(payload: bytes, kind: str, dim: int = 8) -> tuple[int, int, int, list[float]]:
    """REAL stdlib-only codecs for the two formats the standard library can
    parse without third-party dependencies:

    * audio — RIFF/WAVE 16-bit PCM via ``wave`` + ``struct``: returns
      (n_channels, sample_rate, n_frames, dim-bucket RMS envelope of the
      first channel, normalized to [0, 1]);
    * image — binary PPM (``P6``) via its whitespace/comment-tokenized ASCII
      header: returns (width, height, 1, dim-bucket mean byte intensity of
      the raster / maxval).

    Anything else raises NotImplementedError — the same injectable seam a
    real deployment fills with PIL/torchaudio/av via the ``codec=`` argument
    of decode_and_featurize.
    """
    if kind == "audio" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import struct
        import wave

        with wave.open(io.BytesIO(payload)) as w:
            nch, sw = w.getnchannels(), w.getsampwidth()
            rate, nfr = w.getframerate(), w.getnframes()
            raw = w.readframes(nfr)
        if sw != 2:
            raise NotImplementedError("only 16-bit PCM WAV is supported stdlib-side")
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)[::nch]  # channel 0
        chunk = max(1, len(samples) // dim)
        feat = []
        for i in range(dim):
            seg = samples[i * chunk : (i + 1) * chunk] or (0,)
            rms = (sum(s * s for s in seg) / len(seg)) ** 0.5
            feat.append(round(rms / 32768.0, 6))
        return nch, rate, nfr, feat
    if kind == "image" and payload[:2] == b"P6":
        # tokenize the ASCII header: magic, width, height, maxval; '#'
        # comments run to end-of-line; raster starts after ONE whitespace
        # byte following maxval
        toks, pos = [], 2
        while len(toks) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while payload[pos : pos + 1] not in (b"\n", b""):
                    pos += 1
                continue
            t = b""
            while payload[pos : pos + 1] and not payload[pos : pos + 1].isspace():
                t += payload[pos : pos + 1]
                pos += 1
            if not t.isdigit():
                # truncated or malformed header: route to the codec seam
                # (the documented contract) instead of int(b'') ValueError
                # aborting the stage
                raise NotImplementedError(
                    "unparseable PPM header; inject codec= for this payload"
                )
            toks.append(int(t))
        width, height, maxval = toks
        if maxval > 255:
            # legal PPM with 2-byte samples — 6*w*h raster bytes; reading it
            # as 1-byte samples would silently produce wrong features
            raise NotImplementedError("only 1-byte-per-sample PPM (maxval <= 255) is supported stdlib-side")
        raster = payload[pos + 1 : pos + 1 + 3 * width * height]
        chunk = max(1, len(raster) // dim)
        feat = []
        for i in range(dim):
            seg = raster[i * chunk : (i + 1) * chunk] or b"\x00"
            feat.append(round(sum(seg) / len(seg) / maxval, 6))
        return width, height, 1, feat
    raise NotImplementedError(
        "stdlib codecs cover 16-bit PCM WAV and binary PPM; inject codec= "
        "(PIL/torchaudio/av) for other formats"
    )


def decode_and_featurize(
    media: DataFrame,
    fake: bool = True,
    dim: int = 8,
    codec=None,
) -> DataFrame:
    """Decode + feature-extract as one ``mapInPandas`` stage.

    Decoder resolution: an injected ``codec(payload, kind, dim)`` wins;
    otherwise ``fake=True`` uses the deterministic hash-derived fake (pure
    plumbing exercise), and ``fake=False`` uses the REAL stdlib codecs
    (16-bit PCM WAV via ``wave``, binary PPM) — so the path decodes real
    bytes end-to-end in CI with zero third-party dependencies. The Spark
    side (Arrow batches of binary columns, per-executor codec init, output
    schema) is identical in all three modes.
    """

    def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, list[float]]:
        h = hashlib.sha256(payload).digest()
        w, ht = 16 + h[0] % 64, 16 + h[1] % 64
        frames = 1 if kind == "image" else 1 + h[2] % 30
        feat = [round(b / 255.0, 6) for b in h[:dim]]
        return w, ht, frames, feat

    if codec is not None:
        decode = lambda p, k: codec(p, k, dim)  # noqa: E731
    elif fake:
        decode = _fake_decode
    else:
        decode = lambda p, k: stdlib_decode(p, k, dim)  # noqa: E731

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in pdf[["media_id", "kind", "payload"]].itertuples(
                index=False, name=None
            ):
                w, ht, fr, feat = decode(bytes(payload), kind)
                rows.append((media_id, kind, w, ht, fr, feat))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(features: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled frame index —
    pure ``sequence``+``explode``, no Python."""
    # n_frames <= 0 (corrupt/empty media from an injected codec) must yield
    # zero sampled rows, not an illegal-sequence-boundaries error —
    # sequence(0, -1, +5) is invalid with a positive step, so such rows are
    # dropped before the sequence is ever built (explode of their empty
    # index set would produce no rows anyway)
    vids = features.filter((F.col("kind") == "video") & (F.col("n_frames") > 0))
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )
