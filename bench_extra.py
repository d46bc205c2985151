#!/usr/bin/env python
"""Round-7 optimization harness (guide §1.4): per-query noop-sink isolation,
plan capture, and A/B timing — WITHOUT touching the frozen bench.py.

Usage:
  python bench_extra.py time <query> [--sf-dir D] [--repeat N] [--cores N]
  python bench_extra.py plan <query> [--sf-dir D] [--out FILE]
  python bench_extra.py all  [--sf-dir D] [--repeat N]   # every battery query

Timing methodology matches bench.py exactly (warm session, noop sink,
best-of-N) so numbers are comparable; this file exists so the optimization
loop can isolate one query at a time and dump .explain("formatted").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def get_session(cores: int):
    from otar3088_spark.session import get_spark

    spark = get_spark(app_name=f"otar3088-bench-extra-{cores}", cores=cores)
    from pyspark.sql import functions as F

    spark.range(1000).groupBy((F.col("id") % 10).alias("g")).count().count()
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plan", "all"])
    ap.add_argument("query", nargs="?", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_session(args.cores)
    from otar3088_spark.queries import QUERIES

    for t in ("lineitem", "documents", "events"):
        spark.read.parquet(f"{args.sf_dir}/{t}.parquet").limit(1).count()

    if args.mode == "plan":
        df = QUERIES[args.query](spark, args.sf_dir)
        plan = fmt(df)
        if args.out:
            Path(args.out).parent.mkdir(parents=True, exist_ok=True)
            Path(args.out).write_text(plan)
            print(f"wrote {args.out} ({len(plan.splitlines())} lines)")
        else:
            print(plan)
        return

    names = [args.query] if args.mode == "time" else list(QUERIES)
    timings = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            materialize(fn(spark, args.sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        timings[name] = {"best": min(samples), "samples": samples}
        print(json.dumps({name: timings[name]}), flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "timings": {k: v["best"] for k, v in timings.items()}}))


if __name__ == "__main__":
    main()
