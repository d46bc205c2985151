#!/usr/bin/env python
"""Multi-pair N->4N scaling-efficiency campaign (round-6 verdict task #1).

Two readings per config cannot resolve 0.767-vs-0.80 on a box whose
pair-ratio resolution is ~±0.1, so this harness runs the interleaved
2-core / 8-core KG pair many times (fresh JVM per leg, bench.py --repeat 2
warm best-of inside each JVM — the committed scale_bench.py methodology),
records a per-leg box control, discards pairs whose two legs saw
disagreeing windows, and reports the median efficiency with a bootstrap
CI. Results stream to BENCH/SCALING_R7_PAIRS.jsonl so a partial campaign
is still evidence.

Controls (per leg, immediately before the JVM launch, single-threaded):
  cpu_s    — fixed hashlib.md5 spin (CPU/scheduler state)
  bw_s     — fixed numpy large-array copy (DRAM-bandwidth state, the axis
             the allocation-heavy KG job actually rides)
A pair is kept iff BOTH controls agree within 15% between its two legs
(the verdict's discard rule: a pair whose legs saw different windows
measures the box, not the code).
"""

from __future__ import annotations

import json
import os
import random
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT = REPO / "BENCH" / "SCALING_R7_PAIRS.jsonl"


def control() -> dict:
    import hashlib

    t0 = time.perf_counter()
    h = b"x" * 64
    for _ in range(200_000):
        h = hashlib.md5(h).digest()
    cpu_s = time.perf_counter() - t0

    import numpy as np

    a = np.ones(200_000_000 // 8)  # ~200 MB of float64
    t0 = time.perf_counter()
    for _ in range(5):
        b = a.copy()
    bw_s = time.perf_counter() - t0
    del a, b
    return {"cpu_s": round(cpu_s, 3), "bw_s": round(bw_s, 3)}


def leg(cores: int, turns: int) -> float:
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--cores", str(cores),
         "--only", "kg", "--kg-turns", str(turns), "--repeat", "2",
         "--skip-kg-full"],
        capture_output=True, text=True, check=True, cwd=str(REPO),
        env={**os.environ, "SPARK_GRAFT_CPUS": str(cores)},
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["kg"]["kg_turns_per_sec"]


def agree(c2: dict, c8: dict, tol: float = 0.15) -> bool:
    return all(
        abs(c2[k] - c8[k]) / max(c2[k], c8[k]) <= tol for k in ("cpu_s", "bw_s")
    )


def main() -> None:
    turns = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "1600000"))
    pairs = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "8"))
    deadline = os.environ.get("SPARK_GRAFT_SCALE_DEADLINE")  # epoch seconds
    control()  # warm-up: the process's FIRST bw probe pays numpy arena
    # page-faults (~6x slower than steady state) and would spuriously fail
    # the first pair's agreement check
    for i in range(pairs):
        if deadline and time.time() > float(deadline):
            break
        c2 = control()
        tps2 = leg(2, turns)
        c8 = control()
        tps8 = leg(8, turns)
        rec = {
            "pair": i, "turns": turns, "tps2": tps2, "tps8": tps8,
            "efficiency": round((tps8 / tps2) / 4, 3),
            "control_2c": c2, "control_8c": c8,
            "kept": agree(c2, c8), "ts": time.time(),
        }
        with OUT.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    recs = [json.loads(l) for l in OUT.read_text().splitlines()]
    kept = [r["efficiency"] for r in recs if r["kept"]]
    if not kept:
        print("no kept pairs")
        return
    med = statistics.median(kept)
    rng = random.Random(42)
    boots = sorted(
        statistics.median(rng.choices(kept, k=len(kept))) for _ in range(10_000)
    )
    lo, hi = boots[249], boots[9749]  # 95% CI
    print(json.dumps({
        "kept_pairs": len(kept), "discarded": len(recs) - len(kept),
        "median_efficiency": round(med, 3),
        "ci95": [round(lo, 3), round(hi, 3)],
    }))


if __name__ == "__main__":
    main()
