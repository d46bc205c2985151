#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline query battery at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
plus the flagship KG pipeline over a Spark-generated synthetic transcript
corpus, and prints ONE JSON line:

  {"metric": "total_bench_sec", "value": N, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1, "kg": {...}}

Results are materialized with the noop sink (full column computation, no
driver collect). ``--cores N`` overrides parallelism (used by scale_bench.py
for the N vs 4N scaling-efficiency evidence).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

DEFAULT_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "200000"))

# Healthy-box reference for the control query (best-of-3, sf0.1, local[32],
# warm session): measured 0.72-0.89s across rounds 3-5; the committed
# reference is the midpoint. Only comparable at the default bench sf.
CONTROL_QUERY = "pricing_summary"
CONTROL_REF_SEC = 0.80
CONTROL_REF_SF = 0.1

# This box degrades on TWO independent axes (round-5 observation: a session
# measured box_factor 0.97 on the CPU-bound control while every
# allocation-heavy query ran ~1.4-1.5x slow): pricing_summary is
# codegen/CPU-bound and blind to the DRAM-bandwidth side, which is exactly
# the wall the tagging/KG family hits (BENCH/SCALING.md). So a second
# factor is derived from term_tagging — the most allocation-bound battery
# query — against its committed healthy-window best-of-3 (round-5 post-fix
# sessions: 2.97-4.47s; reference is the repeated healthy value). Read
# BENCH_rN.json against BOTH: cpu factor ~1 + alloc factor >>1 = memory-
# bandwidth-degraded window, not a plan regression.
ALLOC_CONTROL_QUERY = "term_tagging"
ALLOC_CONTROL_REF_SEC = 3.9

# THIRD axis (round-5 verdict): a session can be healthy on BOTH controls
# above while the shuffle-heavy family (minhash/simhash/CC) runs 1.4-2.6x
# slow — shuffle/tmpfs/page-cache bandwidth is orthogonal to the CPU and
# allocation axes. simhash_buckets is the smallest plan-stable member of
# that family (one explode + 64 conditional sums + one groupBy); reference
# is the committed healthy best-of-3 reference measured the way the
# control actually runs: FIRST query of a fresh session (cold codegen for
# the 64-bit conditional-sum class; battery-warm repeats read ~1.9s, the
# session-cold best-of-3 on a verified-healthy window reads ~2.5s).
SHUFFLE_CONTROL_QUERY = "simhash_buckets"
SHUFFLE_CONTROL_REF_SEC = 2.5

# Committed healthy best-of per query (min over rounds 1-5 records on
# controls-verified windows; iob_roundtrip re-stamped after the round-6
# let-binding rewrite). Used by the end-of-battery retry rule: one bad box
# window must not stamp a 2x-degraded value into the record when the rest
# of the battery was healthy — any query reading >2x its committed healthy
# value is re-run ONCE at battery end and the min is recorded (with the
# first reading preserved under "retried").
HEALTHY_REF = {
    "ann_cosine_topk": 1.02, "ann_lsh_topk": 1.26, "broadcast_lookup": 0.59,
    "connected_components": 2.61, "dedup_exact": 0.28,
    "dedup_first_wins": 0.38, "distinct_set_audit": 0.31,
    "embedding_near_dups": 2.18, "filter_battery": 0.35,
    "fingerprint": 0.19, "iob_roundtrip": 6.3, "json_props": 0.50,
    "ner_dataset": 5.7,
    "kg_pipeline": 7.27, "kg_pipeline_full": 9.57, "kg_triples": 4.47,
    "kg_triples_gazetteer": 3.82, "mentions_rollup": 3.56,
    "minhash_near_dups": 2.60, "minhash_near_dups_md5": 5.97,
    "mode_priority": 0.40, "model_mentions": 0.39, "multiway_join": 0.70,
    "ngram_jaccard_pairs": 1.00, "pricing_summary": 0.64,
    "quality_score": 0.29, "right_join_dedup": 0.70, "semi_anti": 0.68,
    "seq_classify": 0.31, "sessionize": 0.50, "set_ops": 0.59,
    "simhash_buckets": 1.94, "simhash_buckets_md5": 1.86,
    "term_tagging": 3.30, "term_tagging_bigram": 3.71, "token_stats": 0.21,
    "top_revenue_orders": 1.16, "topk_per_group": 0.53,
}


def materialize(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def run_bench(
    cores: int,
    sf_dir: str,
    kg_turns: int,
    only: str | None = None,
    repeat: int = 2,
    with_kg_full: bool = True,
) -> dict:
    from otar3088_spark.session import get_spark

    spark = get_spark(app_name=f"otar3088-bench-{cores}", cores=cores)
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    # warm-up: JVM/codegen/parquet-footer costs out of the first timed query
    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 10).alias("g")).count().count()
    for t in ("lineitem", "documents", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()

    timings: dict[str, float] = {}

    # --- box-state control (round-5 verdict task 4) -------------------------
    # This box's wall-clock is bimodal between sessions (2-3x swings on
    # identical input). Run a fixed, plan-stable control query FIRST and
    # record its ratio vs a committed healthy-box reference, so a slow
    # window is visible INSIDE the bench record instead of needing
    # cross-session forensics. box_factor ~1 = healthy; >>1 = degraded
    # session, read absolute numbers with that factor in mind.
    # the committed reference is a local[32] measurement — at other core
    # counts the control would read 2-3x high on a healthy box and corrupt
    # the exact signal it exists to provide (scale_bench runs cores=2/8)
    control: dict[str, float] = {}
    if sf == CONTROL_REF_SF and cores == 32:
        from otar3088_spark.queries import QUERIES as _Q

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(_Q[CONTROL_QUERY](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        control = {
            "control_query": CONTROL_QUERY,
            "control_sec": round(best, 3),
            "control_ref_sec": CONTROL_REF_SEC,
            "box_factor": round(best / CONTROL_REF_SEC, 2),
        }
        best_sh = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(_Q[SHUFFLE_CONTROL_QUERY](spark, sf_dir))
            best_sh = min(best_sh, time.perf_counter() - t0)
        control.update(
            shuffle_control_query=SHUFFLE_CONTROL_QUERY,
            shuffle_control_sec=round(best_sh, 3),
            shuffle_control_ref_sec=SHUFFLE_CONTROL_REF_SEC,
            box_factor_shuffle=round(best_sh / SHUFFLE_CONTROL_REF_SEC, 2),
        )

    if only in (None, "queries"):
        from otar3088_spark.queries import QUERIES

        # best-of-N per query: this box's wall-clock is bimodal (2-3x swings
        # between identical runs); the min of repeated runs on identical
        # deterministic input is the statistic that tracks plan quality.
        for name, fn in QUERIES.items():
            best = float("inf")
            for _ in range(max(repeat, 1)):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        # end-of-battery retry: one bad window inside an otherwise-healthy
        # battery must not stamp a 2x-degraded reading into the record
        # (round-5 verdict: the shuffle family read 1.4-2.6x high while
        # both controls said healthy). Only comparable at the bench sf.
        retried: dict[str, float] = {}
        if sf == CONTROL_REF_SF:
            for name, fn in QUERIES.items():
                ref = HEALTHY_REF.get(name)
                if ref and timings.get(name, 0.0) > 2 * ref:
                    t0 = time.perf_counter()
                    materialize(fn(spark, sf_dir))
                    rerun = time.perf_counter() - t0
                    retried[name] = timings[name]
                    timings[name] = round(min(timings[name], rerun), 3)
        if retried:
            control["retried"] = retried
        if sf == CONTROL_REF_SF and cores == 32 and ALLOC_CONTROL_QUERY in timings:
            control["alloc_control_query"] = ALLOC_CONTROL_QUERY
            control["alloc_control_sec"] = timings[ALLOC_CONTROL_QUERY]
            control["alloc_control_ref_sec"] = ALLOC_CONTROL_REF_SEC
            control["box_factor_alloc"] = round(
                timings[ALLOC_CONTROL_QUERY] / ALLOC_CONTROL_REF_SEC, 2
            )

    kg: dict[str, float] = {}
    if only in (None, "kg"):
        from otar3088_spark.plans.kg_pipeline import build_kg
        from otar3088_spark.synth import entity_dictionary_pandas, transcripts_spark

        dictionary = spark.createDataFrame(entity_dictionary_pandas())
        transcripts = transcripts_spark(spark, kg_turns)
        import tempfile

        staging_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
        import shutil

        def run_kg(use_model: bool) -> tuple[float, int]:
            sec, n = float("inf"), 0
            for _ in range(max(repeat, 1)):
                staging = tempfile.mkdtemp(prefix="kg_staging_", dir=staging_root)
                t0 = time.perf_counter()
                res = build_kg(
                    transcripts, dictionary, salt_partitions=cores * 2,
                    staging_dir=staging, use_model=use_model,
                )
                n = res.triples.count()
                sec = min(sec, time.perf_counter() - t0)
                shutil.rmtree(staging, ignore_errors=True)
            return sec, n

        # primary headline: gazetteer-only (round-over-round comparable);
        # kg_full: the north-star merged path (gazetteer + model-scored spans
        # via mapInPandas + entity linking) — its extra cost is the Arrow
        # round-trip + the Python stand-in scorer, i.e. the honest price of
        # the transformer branch without a GPU in the container.
        kg_sec, n_triples = run_kg(False)
        kg = {
            "kg_turns": kg_turns,
            "kg_sec": round(kg_sec, 3),
            "kg_turns_per_sec": round(kg_turns / kg_sec, 1),
            "kg_triples": n_triples,
        }
        timings["kg_pipeline"] = round(kg_sec, 3)
        if with_kg_full:
            kg_full_sec, n_triples_full = run_kg(True)
            kg.update(
                kg_full_sec=round(kg_full_sec, 3),
                kg_full_turns_per_sec=round(kg_turns / kg_full_sec, 1),
                kg_full_triples=n_triples_full,
            )
            timings["kg_pipeline_full"] = round(kg_full_sec, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "repeat": repeat,
        "kg": kg,
        **control,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--kg-turns", type=int, default=DEFAULT_TURNS)
    ap.add_argument("--only", choices=["queries", "kg"], default=None)
    # best-of-3 default: this box's wall-clock is bimodal with ~2x swings
    # between sessions; two samples routinely land both in the slow mode
    ap.add_argument("--repeat", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")))
    ap.add_argument("--skip-kg-full", action="store_true",
                    help="skip the merged gazetteer+model kg_full measurement")
    args = ap.parse_args()
    result = run_bench(
        args.cores, args.sf_dir, args.kg_turns, args.only, args.repeat,
        with_kg_full=not args.skip_kg_full,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
