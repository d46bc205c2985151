#!/usr/bin/env python
"""G1 heap-size probe (round-5 verdict task 3): the SAME 10M-turn gazetteer
KG job ran 2.1x slower under a 48g driver heap than under the default 8g
(BENCH/SCALE_POINTS.md decade-point caveat). This tool runs the job once per
JVM configuration in a FRESH subprocess JVM (driver memory and
extraJavaOptions are launch-time flags), with unified GC logging, and
reports turns/s plus the parsed GC pause budget per config — so the 48g
collapse is root-caused instead of waved at.

Usage: python tools/gc_probe.py [--turns 10000000] [--configs name,name,...]
Prints one line per config; writes nothing (paste results into
BENCH/SCALE_POINTS.md / session.py once adjudicated).
"""

from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CONFIGS: dict[str, tuple[str, str]] = {
    # name -> (driver memory, extra JVM flags)
    "8g-default": ("8g", ""),
    "48g-default": ("48g", ""),
    # 48g ergonomics pick 16m regions (heap/2048 -> pow2); pin both ends
    "48g-region4m": ("48g", "-XX:G1HeapRegionSize=4m"),
    "48g-region32m": ("48g", "-XX:G1HeapRegionSize=32m"),
    # let G1 trade pause goal for throughput (default goal is 200ms)
    "48g-pause1s": ("48g", "-XX:MaxGCPauseMillis=1000"),
    # cap the young gen at the 8g-equivalent absolute size: if the collapse
    # is young-volume / allocation-locality (not region size), this recovers
    # throughput (experimental flag needs the unlock)
    "48g-young25": (
        "48g",
        "-XX:+UnlockExperimentalVMOptions -XX:G1MaxNewSizePercent=25",
    ),
    # no concurrent phases at all: if ParallelGC at 48g recovers, the cost
    # is G1's concurrent cycles competing for DRAM bandwidth, not heap size
    "48g-parallel": ("48g", "-XX:+UseParallelGC"),
    # sizing curve: is the degradation a cliff or monotonic in heap size?
    "16g-default": ("16g", ""),
    # young arena forced BELOW the 8g config's (~2.4g vs up to 4.8g): if the
    # mutator slowdown persists even here, the cost scales with TOTAL heap
    # footprint, not the allocation arena
    "48g-young5": (
        "48g",
        "-XX:+UnlockExperimentalVMOptions -XX:G1MaxNewSizePercent=5",
    ),
    # TLB-reach discriminator: back the heap with 2m pages (THP is madvise
    # on this box). If 48g+THP recovers toward 8g, the collapse is page-walk
    # cost over a 4k-paged multi-10GB heap, not GC policy at all
    "48g-thp": ("48g", "-XX:+UseTransparentHugePages"),
    "8g-thp": ("8g", "-XX:+UseTransparentHugePages"),
}

WORKER = r"""
import os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from otar3088_spark.plans.kg_pipeline import build_kg
from otar3088_spark.session import get_spark
from otar3088_spark.synth import entity_dictionary_pandas, transcripts_spark

n = {turns}
cores = 32
spark = get_spark(app_name="gc-probe", cores=cores)
spark.range(1000).count()
d = spark.createDataFrame(entity_dictionary_pandas())
salt = max(cores * 2, n // 200_000)
spark.conf.set("spark.sql.shuffle.partitions", str(max(cores, n // 500_000)))
t = transcripts_spark(spark, n)
# one warmup at 1/10 scale so codegen/JIT cost lands outside the measurement
staging = tempfile.mkdtemp(prefix="gcw_", dir="/dev/shm")
build_kg(transcripts_spark(spark, n // 10), d, salt_partitions=cores * 2,
         staging_dir=staging).triples.count()
shutil.rmtree(staging, ignore_errors=True)
staging = tempfile.mkdtemp(prefix="gcp_", dir="/dev/shm")
t0 = time.perf_counter()
res = build_kg(t, d, salt_partitions=salt, staging_dir=staging)
ntr = res.triples.count()
sec = time.perf_counter() - t0
shutil.rmtree(staging, ignore_errors=True)
print(f"RESULT sec={{sec:.1f}} tps={{n / sec:.0f}} triples={{ntr}}", flush=True)
"""

PAUSE_RE = re.compile(r"Pause (Young|Full|Remark|Cleanup).*?(\d+(?:\.\d+)?)ms")


def parse_gc(log_path: str) -> dict[str, float]:
    tot: dict[str, float] = {}
    n_full = 0
    try:
        text = Path(log_path).read_text()
    except OSError:
        return {}
    for kind, ms in PAUSE_RE.findall(text):
        tot[kind] = tot.get(kind, 0.0) + float(ms)
        if kind == "Full":
            n_full += 1
    out = {f"gc_{k.lower()}_sec": round(v / 1000, 1) for k, v in tot.items()}
    out["gc_total_sec"] = round(sum(tot.values()) / 1000, 1)
    out["full_gcs"] = n_full
    m = re.search(r"Heap Region Size: (\d+)M", text)
    if m:
        out["region_mb"] = int(m.group(1))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=10_000_000)
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of: " + ",".join(CONFIGS))
    args = ap.parse_args()
    names = args.configs.split(",") if args.configs else list(CONFIGS)

    for name in names:
        mem, flags = CONFIGS[name]
        gclog = tempfile.mktemp(prefix=f"gc_{name}_", suffix=".log", dir="/tmp")
        env = dict(os.environ)
        env["SPARK_DRIVER_MEMORY"] = mem
        env["SPARK_GRAFT_DRIVER_JAVA_OPTS"] = (
            f"{flags} -Xlog:gc:file={gclog}".strip()
        )
        # Popen + own process group, NOT subprocess.run(timeout=...): on
        # timeout, run() kills only the direct python child and then blocks
        # on the captured pipes, which the py4j-launched Spark JVM
        # grandchild also holds open — the 8g JVM would survive to
        # contaminate every later config's measurement. killpg reaps the
        # whole tree.
        proc = subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=str(REPO), turns=args.turns)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, start_new_session=True,
        )
        try:
            out, err = proc.communicate(timeout=3600)
        except subprocess.TimeoutExpired:
            # one slow config must not abort the comparison suite — kill
            # the whole group, record what the GC log captured, move on
            os.killpg(proc.pid, signal.SIGKILL)
            proc.communicate()
            print(f"{name}: TIMEOUT >3600s {parse_gc(gclog)}", flush=True)
            continue
        res = [l for l in out.splitlines() if l.startswith("RESULT")]
        gc = parse_gc(gclog)
        print(f"{name}: {res[0] if res else 'FAILED rc=' + str(proc.returncode)} {gc}",
              flush=True)
        if not res:
            print(err[-2000:], flush=True)


if __name__ == "__main__":
    main()
