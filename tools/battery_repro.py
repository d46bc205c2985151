#!/usr/bin/env python
"""Reproducer + bisection harness for the term_tagging battery-context
regression (round-4 verdict "What's wrong" #1): standalone the tagging
kernel runs ~4.6-4.8s warm, but after the full battery prefix (~45
materializations in the same JVM) every repeat costs ~10.6s.

Runs the battery prefix (every query before term_tagging, x repeats), then
times term_tagging N more times, printing EACH repetition so warm-up vs
steady-state is visible. Probes are switchable:

  --codegen-cache N   set spark.sql.codegen.cache.maxEntries (static conf).
                      NOTE: the engine's session factory now bakes in 1000
                      (the round-5 fix, session.py ENGINE_SQL_CONF), so a
                      flagless run measures the FIXED config; pass
                      --codegen-cache 100 (the raw JVM default) to
                      reproduce the original regression
  --prefix-repeat R   repeats per prefix query (default 3 = bench.py's)
  --reps N            term_tagging timing repetitions (default 4)
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--codegen-cache", type=int, default=None)
    ap.add_argument("--prefix-repeat", type=int, default=3)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--skip-prefix", action="store_true")
    ap.add_argument("--instrument", action="store_true",
                    help="phase-by-phase timing of the tagging plan build")
    args = ap.parse_args()

    from otar3088_spark.session import get_spark

    extra = {}
    if args.codegen_cache is not None:
        extra["spark.sql.codegen.cache.maxEntries"] = str(args.codegen_cache)
    spark = get_spark(app_name="battery-repro", cores=args.cores, extra_conf=extra)

    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 10).alias("g")).count().count()
    for t in ("lineitem", "documents", "events"):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").limit(1).count()

    from otar3088_spark.queries import QUERIES

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    names = list(QUERIES)
    cut = names.index("term_tagging")
    if not args.skip_prefix:
        t0 = time.perf_counter()
        for name in names[:cut]:
            best = float("inf")
            for _ in range(args.prefix_repeat):
                s = time.perf_counter()
                mat(QUERIES[name](spark, args.sf_dir))
                best = min(best, time.perf_counter() - s)
            print(f"prefix {name}: {best:.3f}s", flush=True)
        print(f"prefix total: {time.perf_counter() - t0:.1f}s", flush=True)

    if args.instrument:
        from pyspark.sql import functions as F

        from otar3088_spark.operators.tagging import (
            _allowed_forms_expr,
            prepare_dictionary,
            tag_mentions,
        )
        from otar3088_spark.queries import _doc_dict_df

        for i in range(args.reps):
            s = time.perf_counter()
            ddf = prepare_dictionary(_doc_dict_df(spark))
            t_dict = time.perf_counter() - s

            s = time.perf_counter()
            d_norm = (
                ddf.withColumn(
                    "nd_tokens", F.transform(F.col("term_tokens"), lambda t: F.coalesce(t, t))
                )
                .groupBy("ent_id", "label", "nd_tokens")
                .agg(F.min("term").alias("term"))
                .withColumn("n", F.size("nd_tokens").cast("int"))
                .withColumn(
                    "allowed",
                    F.transform(F.col("nd_tokens"), lambda t: _allowed_forms_expr(t, {})),
                )
            )
            d0 = d_norm.withColumn("first_tok", F.explode(F.element_at("allowed", 1)))
            t_d0_plan = time.perf_counter() - s
            s = time.perf_counter()
            n_first = len(d0.select("first_tok").distinct().limit(50001).collect())
            t_collect = time.perf_counter() - s

            d = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
                F.col("doc_id").cast("string").alias("conv_id"),
                F.lit(0).cast("int").alias("turn_idx"),
                F.lit(0).cast("int").alias("sent_idx"),
                F.col("text").alias("sent_text"),
            )
            s = time.perf_counter()
            # match the shipped query's stage-2 formulation (queries.py
            # passes precompute_offsets=True for whole-document sentences)
            spans = tag_mentions(d, ddf, precompute_offsets=True)
            t_full_build = time.perf_counter() - s
            s = time.perf_counter()
            mat(spans)
            t_exec = time.perf_counter() - s
            print(
                f"instr rep{i}: dict_plan={t_dict:.3f} d0_plan={t_d0_plan:.3f} "
                f"anchor_collect={t_collect:.3f}s(n={n_first}) "
                f"tag_mentions_build={t_full_build:.3f} exec={t_exec:.3f}",
                flush=True,
            )
        return

    fn = QUERIES["term_tagging"]
    times = []
    for i in range(args.reps):
        # split plan-construction (driver/py4j/analysis) from execution
        s = time.perf_counter()
        df = fn(spark, args.sf_dir)
        built = time.perf_counter() - s
        mat(df)
        total = time.perf_counter() - s
        times.append(total)
        print(f"term_tagging rep{i}: build={built:.3f}s total={total:.3f}s", flush=True)
    print(f"best={min(times):.3f}s  (controls above)", flush=True)


if __name__ == "__main__":
    main()
