#!/usr/bin/env python
"""Scale-point + skew-resilience evidence for the KG pipeline.

Measures the flagship KG job (gazetteer path, staging snapshot, salted
repartition) at growing input sizes and under head-conversation skew
(``skew_frac`` of ALL turns in one conversation). The north rule calls out
long-conversation skew explicitly; because every stage keys on the composite
(conv_id, turn_idx) — never on conv_id alone — a giant conversation spreads
across partitions and throughput should hold within noise.

Writes BENCH/SCALE_POINTS.md. Timings: best-of-2 warm (bimodal wall-clock).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from otar3088_spark.plans.kg_pipeline import build_kg
    from otar3088_spark.session import get_spark
    from otar3088_spark.synth import entity_dictionary_pandas, transcripts_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="scale-points", cores=cores)
    spark.range(1000).count()
    d = spark.createDataFrame(entity_dictionary_pandas())
    staging_root = "/dev/shm" if os.path.isdir("/dev/shm") else None

    cases = [
        ("2M uniform", 2_000_000, 0.0, 2),
        ("2M skew50 (half of all turns in ONE conversation)", 2_000_000, 0.5, 2),
        ("2M skew90 (90% of all turns in ONE conversation)", 2_000_000, 0.9, 2),
        ("10M uniform", 10_000_000, 0.0, 2),
    ]
    # model-path suite (round-5 verdict task 2): the north-star MERGED path
    # (gazetteer + mapInPandas model scoring + entity linking) at scale.
    # Opt-in; prints rows only (SCALE_POINTS.md's model section is curated
    # by hand alongside the gazetteer table).
    use_model = bool(int(os.environ.get("SPARK_GRAFT_SCALE_POINT_MODEL", "0")))
    if use_model:
        cases = [
            ("2M uniform (merged model path)", 2_000_000, 0.0, 2),
            ("10M uniform (merged model path)", 10_000_000, 0.0, 1),
        ]
    # opt-in decade point (e.g. SPARK_GRAFT_SCALE_POINT_BIG=100000000):
    # single rep — one warm-ish measurement of a ~half-hour job beats two
    # cold ones, and the three standing points already quantify jitter
    big = int(os.environ.get("SPARK_GRAFT_SCALE_POINT_BIG", "0"))
    if big:
        cases.append((f"{big // 1_000_000}M uniform", big, 0.0, 1))
    reps_env = os.environ.get("SPARK_GRAFT_SCALE_POINT_REPS")
    rows = []
    for name, n, skew, case_reps in cases:
        reps = int(reps_env) if reps_env else case_reps
        # partition sizing scales with the input: ~200k turns per salt
        # partition and ~500k turns per shuffle partition keep task inputs
        # bounded as n grows (on a real cluster these track executor count)
        salt = max(cores * 2, n // 200_000)
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, n // 500_000)))
        t = transcripts_spark(spark, n, skew_frac=skew)
        best, triples = float("inf"), 0
        for _ in range(reps):
            staging = tempfile.mkdtemp(prefix="kg_sp_", dir=staging_root)
            t0 = time.perf_counter()
            res = build_kg(
                t, d, salt_partitions=salt, staging_dir=staging, use_model=use_model
            )
            triples = res.triples.count()
            best = min(best, time.perf_counter() - t0)
            shutil.rmtree(staging, ignore_errors=True)
        rows.append((name, n, skew, best, n / best, triples))
        print(f"{name}: {best:.1f}s -> {n / best:,.0f} turns/s ({triples:,} triples)", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", str(cores))
    if use_model:
        return  # printed rows only; md table is curated by hand

    out = Path(__file__).resolve().parent.parent / "BENCH" / "SCALE_POINTS.md"
    lines = [
        "# KG pipeline scale points + skew resilience",
        "",
        f"Gazetteer path, staging snapshot, local[{cores}]; salt and shuffle",
        "partitions scale with input (~200k / ~500k turns per partition).",
        "Best-of-2 warm runs per point (single rep for the 100M decade point;",
        "bimodal wall-clock box).",
        "",
        "| case | turns | skew_frac | sec | turns/sec | triples |",
        "|---|---|---|---|---|---|",
    ]
    for name, n, skew, sec, tps, triples in rows:
        lines.append(f"| {name} | {n:,} | {skew} | {sec:.1f} | {tps:,.0f} | {triples:,} |")
    u = next(r for r in rows if r[2] == 0.0 and r[1] == 2_000_000)
    s = next(r for r in rows if r[2] == 0.5)
    lines += [
        "",
        f"Skew resilience: a conversation holding 50% of ALL turns costs "
        f"{(s[3] / u[3] - 1) * 100:+.1f}% vs uniform at the same size — every "
        "stage keys on the composite (conv_id, turn_idx), so conv-level skew "
        "never concentrates on one partition; the dictionary side is always "
        "broadcast, so head ENTITIES never shuffle either.",
        "",
        "Throughput rises with input size (fixed JVM/plan overheads amortize) —",
        "the design point is a multi-executor cluster at 10^9+ turns where the",
        "same per-core work rates apply per executor (see BENCH/SCALING.md for",
        "the N→4N evidence).",
    ]
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
