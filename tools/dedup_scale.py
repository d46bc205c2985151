#!/usr/bin/env python
"""Dedup-family scale evidence (round-5 verdict task 5): MinHash+LSH
near-dup detection at millions of synthetic documents.

The corpus is ``synth.documents_spark`` — pure column expressions with
PLANTED near-dup twins (dup_frac of all docs; expected pair count is exact:
n_docs * dup_frac / 2), so recall is checkable at any scale without an
oracle run. Per scale point this measures:

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
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from otar3088_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_signatures,
    )
    from otar3088_spark.session import get_spark
    from otar3088_spark.synth import documents_spark

    spark = get_spark(app_name="dedup-scale", cores=args.cores)
    spark.range(1000).count()

    for n in args.docs:
        docs = documents_spark(spark, n, dup_frac=args.dup_frac)
        expected = int(n * args.dup_frac / 2)

        best, found = float("inf"), -1
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            found = minhash_near_dups(docs, threshold=0.7).count()
            best = min(best, time.perf_counter() - t0)

        # candidate volume + bucket histogram from the same signature plan
        sig = minhash_signatures(docs)
        n_cand = lsh_candidate_pairs(sig).count()
        rpb = 4
        banded = sig.select(
            F.posexplode(
                F.array(
                    *[
                        F.concat_ws(
                            "_",
                            *[F.col("sig")[b * rpb + r].cast("string") for r in range(rpb)],
                        )
                        for b in range(8)
                    ]
                )
            ).alias("band_idx", "band_hash")
        )
        hist = (
            banded.groupBy("band_idx", "band_hash")
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
