#!/usr/bin/env python
"""Dedup-family scale evidence (round-5 verdict task 5): MinHash+LSH
near-dup detection at millions of synthetic documents.

The corpus is ``synth.documents_spark`` — pure column expressions with
PLANTED near-dup twins (dup_frac of all docs; expected pair count is exact:
``synth.planted_dup_pairs``), so recall is checkable at any scale without
an oracle run. Per scale point this measures:

* wall-clock + docs/sec for the FULL pipeline (signatures -> banded
  candidates -> exact-Jaccard verify), best-of-N;
* candidate-pair count vs verified-pair count (the band join's precision);
* the band-bucket size histogram — the "bucketed, never all-pairs" claim:
  bucket sizes must stay O(planted cluster), not O(corpus).

Append the printed block to BENCH/SCALE_POINTS.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="+", default=[1_000_000, 10_000_000])
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override spark.sql.shuffle.partitions — at 10M+ docs "
                         "the session default (32) leaves ~7M-row sort runs per "
                         "partition and the SMJ sorts spill; size so a partition "
                         "holds ~1M exploded shingle rows")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from otar3088_spark.operators.dedup import (
        banded_signatures,
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_signatures,
    )
    from otar3088_spark.session import get_spark
    from otar3088_spark.synth import documents_spark, planted_dup_pairs

    spark = get_spark(app_name="dedup-scale", cores=args.cores)
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark.range(1000).count()

    for n in args.docs:
        docs = documents_spark(spark, n, dup_frac=args.dup_frac)
        expected = planted_dup_pairs(n, args.dup_frac)

        best, found = float("inf"), -1
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            found = minhash_near_dups(docs, threshold=0.7).count()
            best = min(best, time.perf_counter() - t0)

        # candidate volume + bucket histogram from the same signature plan
        sig = minhash_signatures(docs)
        n_cand = lsh_candidate_pairs(sig).count()
        hist = (
            banded_signatures(sig)
            .groupBy("band_idx", "band_hash")
            .count()
            .groupBy(F.col("count").alias("bucket_size"))
            .agg(F.count(F.lit(1)).alias("n_buckets"))
            .orderBy("bucket_size")
            .collect()
        )
        hist_s = ", ".join(f"size {r['bucket_size']}: {r['n_buckets']:,}" for r in hist)
        print(
            f"docs={n:,}: {best:.1f}s  {n / best:,.0f} docs/s  "
            f"candidates={n_cand:,}  verified={found:,}  planted={expected:,}  "
            f"recall={'EXACT' if found == expected else f'{found / expected:.4f}'}\n"
            f"  band-bucket histogram: {hist_s}",
            flush=True,
        )


if __name__ == "__main__":
    main()
