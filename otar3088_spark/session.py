"""SparkSession factory tuned for the KG-construction workload.

Scale posture (BASELINE.json north_rule): the same builder config is what we
would pass to ``spark-submit`` on a 1000-executor cluster — AQE for runtime
re-planning and skew-join splitting, Arrow for the (rare) pandas-UDF surface,
shuffle partitions sized to cores locally / to ``max(2*cores_total, input_TB*64)``
on a cluster. Locally everything runs in one JVM (``local[N]``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Columns of the canonical input table (BASELINE.json input_hint).
TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

# Engine SQL configuration shared by local sessions (get_spark) and
# spark-submit jobs (submit_spark / jobs/kg_submit.py). Everything here is
# cluster-size independent; master / memory / local dirs are deliberately
# NOT in this dict — locally get_spark pins them, under spark-submit the
# cluster manager owns them.
ENGINE_SQL_CONF = {
    # --- determinism / oracle comparability ---
    "spark.sql.session.timeZone": "UTC",
    # --- adaptive execution: runtime re-plan, skew-join split, coalesce ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE's coalescing floor (default 1 MB) is byte-based and blind to
    # expression weight: a shuffle carrying a few MB of compact candidate
    # structs that feeds an interpreted higher-order-function stage gets
    # coalesced to cores x (bytes/1MB) partitions — measured round 7:
    # the tagging validation stage ran 4-5 of 32 tasks wide at bench sf,
    # term_tagging 2.2 -> 1.2 s and iob_roundtrip 5.4 -> 2.3 s once the
    # floor stopped binding. SCALE-ADAPTIVE by construction: with
    # parallelismFirst (default true) the coalescing target is
    # max(totalBytes / defaultParallelism, minPartitionSize), so lowering
    # the floor only affects shuffles smaller than ~parallelism x 1 MB —
    # cluster-scale shuffles keep their bytes-proportional sizing
    # unchanged.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # --- Arrow transport for the sanctioned pandas-UDF surface ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # --- scans: keep file-split sizing explicit so partition counts are
    #     stable across sf tiers (parquet row-group aligned) ---
    "spark.sql.files.maxPartitionBytes": "134217728",
    # --- broadcast: dictionaries are always small dims; give headroom ---
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- codegen class cache: the default (100 entries, static conf) is
    #     smaller than one bench battery's worth of distinct generated
    #     classes, so a long-lived session evicts and recompiles its
    #     LARGEST classes (the fused tagging stage) on every re-entry.
    #     Compiled classes are tiny next to the heap; 10x the cache. ---
    "spark.sql.codegen.cache.maxEntries": "1000",
}


def get_spark(
    app_name: str = "otar3088-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    ``shuffle_partitions`` defaults to ``cores`` — right-sized for local mode;
    on a real cluster pass an explicit value (~2-3x total executor cores).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cores

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        # --- shuffle sizing ---
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # local mode: driver heap IS the executor heap. Runtime contract
        # (probed, BENCH/GC_PROBE.md): job wall scales MONOTONICALLY with
        # committed heap on this box (10M-turn KG job: 8g=238s, 16g=438s,
        # 48g=634s) with a small GC budget throughout — a mutator-locality
        # footprint tax (Spark sets -Xms=-Xmx; G1 spreads the allocation
        # arena over the whole range), not a GC policy artifact: region
        # size, pause goal, young-gen caps, ParallelGC and THP all measure
        # WORSE at 48g (THP 2.6x worse; never enable it here). Size the
        # heap to the working set (8g); fix memory pressure with more
        # partitions, not more heap.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    # Shuffle/spill scratch on tmpfs when available: the sandbox's /tmp sits
    # on a shared virtio disk with erratic write latency (measured 3-4x
    # whole-job swings); RAM-backed local dirs remove disk from the shuffle
    # path. On a real cluster leave spark.local.dir to the NVMe defaults.
    if os.path.isdir("/dev/shm") and "spark.local.dir" not in (extra_conf or {}):
        scratch = "/dev/shm/spark-local"
        os.makedirs(scratch, exist_ok=True)
        builder = builder.config("spark.local.dir", scratch)
    # Driver-JVM flag passthrough (GC probes, tools/gc_probe.py): only takes
    # effect when the session LAUNCHES the JVM — a getOrCreate against a
    # live gateway cannot change launch-time flags, same as driver.memory.
    java_opts = os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def submit_spark(app_name: str = "otar3088-kg") -> SparkSession:
    """SparkSession for a ``spark-submit`` job (jobs/kg_submit.py).

    Applies only :data:`ENGINE_SQL_CONF` — master, executor/driver memory,
    parallelism, shuffle-partition count and local dirs belong to the
    cluster manager and the submit command line (``--master``, ``--conf``),
    never to job code. The codegen-cache entry is a static conf, which is
    fine here: under spark-submit the session does not exist yet when the
    builder runs."""
    builder = SparkSession.builder.appName(app_name)
    for k, v in ENGINE_SQL_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
