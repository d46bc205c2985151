#!/usr/bin/env python
"""Tagging-kernel stress points (round-5 verdict tasks 6+7).

1. LONG DOCUMENTS: term_tagging feeds whole documents as single sentences;
   the per-candidate start-offset computation is an O(pos) fold
   (tagging.py). Growing document length k-fold multiplies BOTH the
   candidate count (~k) and the mean candidate position (~k), so if the
   fold dominated, time would grow ~k^2. This probe tags the sf0.1
   documents corpus with text repeated k=1/4/10 times and records wall
   time + candidate counts, pinning the actual exponent.

2. DICTIONARY SKEW: the anchor join blocks on the term's first token. A
   gazetteer where thousands of terms share one first token (all
   "human ...") makes every corpus occurrence of that token a candidate x
   |terms with that anchor|. This probe tags with a 1-common-anchor
   dictionary of growing width and records wall time + candidate volume.

Prints one line per point; paste adjudicated results into
BENCH/TAGGING_STRESS.md.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def mat(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--which", choices=["longdoc", "dictskew", "both"], default="both")
    ap.add_argument("--precompute", action="store_true",
                    help="use the per-sentence offsets-array stage-2 path")
    ap.add_argument("--bigram", action="store_true",
                    help="force the bigram-anchor blocking key everywhere")
    ap.add_argument("--unigram", action="store_true",
                    help="force the unigram anchor (disable auto skew detection)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from otar3088_spark.operators.tagging import prepare_dictionary, tag_mentions
    from otar3088_spark.queries import _doc_dict_df
    from otar3088_spark.session import get_spark

    spark = get_spark(app_name="tagging-stress", cores=args.cores)
    spark.range(1000).count()

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    def corpus(k: int):
        # repeat each document's text k times -> k-fold longer single-sentence
        # docs, same row count; cached to parquet-free memory via noop warm
        return docs.select(
            F.col("doc_id").cast("string").alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit(0).cast("int").alias("sent_idx"),
            F.concat_ws(" ", F.array_repeat(F.col("text"), k)).alias("sent_text"),
        )

    if args.which in ("longdoc", "both"):
        d = prepare_dictionary(_doc_dict_df(spark))
        base_sec = None
        for k in (1, 4, 10):
            c = corpus(k)
            spans = tag_mentions(c, d, precompute_offsets=args.precompute)
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                mat(spans)
                best = min(best, time.perf_counter() - t0)
            n_spans = spans.count()
            if base_sec is None:
                base_sec = best
            print(
                f"longdoc k={k}: {best:.2f}s  spans={n_spans:,}  "
                f"time_ratio={best / base_sec:.2f} (linear would be ~{k})",
                flush=True,
            )

    if args.which in ("dictskew", "both"):
        # terms all anchored on one first token that occurs in ~every doc:
        # "table <w>" for the W most frequent words following "table"-ish
        # positions; synthetic two-token terms guarantee anchor collisions
        # without window matches beyond the real ones
        c = corpus(1)
        for width in (8, 512, 4096):
            terms = [(f"S{i:05d}", f"table w{i:05d}", "Obj") for i in range(width)]
            # one REAL multi-token term so hits exist
            terms.append(("S99999", "table name", "Obj"))
            dd = spark.createDataFrame(
                terms, ["ent_id", "term", "label"]
            ).withColumn("canonical_id", F.col("ent_id"))
            d = prepare_dictionary(dd)
            spans = tag_mentions(
                c, d,
                precompute_offsets=args.precompute,
                bigram_anchor=(True if args.bigram else False if args.unigram else None),
            )
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                mat(spans)
                best = min(best, time.perf_counter() - t0)
            n_spans = spans.count()
            print(
                f"dictskew width={width}: {best:.2f}s  spans={n_spans:,}",
                flush=True,
            )


if __name__ == "__main__":
    main()
