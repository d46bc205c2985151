"""Incremental transcript ingestion — Structured Streaming with availableNow.

The reference has no streaming (SURVEY.md §2.9) and the north rule asks for
*resumable batch*, so the engine's incremental path is Structured Streaming's
``availableNow`` trigger: each invocation processes exactly the new files
since the last checkpoint offset and terminates — i.e. incremental batch with
exactly-once file-source semantics, the Spark-native analogue of Iceberg
snapshot-diff incremental reads.

``incremental_kg_update`` runs the KG pipeline per micro-batch via
``foreachBatch`` (batch DataFrame inside → full operator set available) and
appends triples with per-batch lineage columns. Re-running after a crash
resumes from the streaming checkpoint: already-committed source files are
never reprocessed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a growing directory of transcript parquet."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def write_triples_batch(triples: DataFrame, batch_id: int, output_dir: str) -> None:
    """Idempotent per-batch triple write: dynamic partition overwrite of the
    ``batch_id=<id>`` directory. foreachBatch is at-least-once (a crash
    between the sink write and the checkpoint commit replays the batch);
    overwriting the batch's own partition makes the replay a no-op instead
    of a duplicate — the exactly-once claim holds end-to-end. Same shape as
    an Iceberg overwrite-by-filter commit."""
    (
        triples.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(output_dir)
    )


def incremental_kg_update(
    spark: SparkSession,
    input_dir: str,
    dictionary: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Process all currently-available new files into the triple sink, then
    stop (availableNow). Each micro-batch writes append-mode parquet with
    ``batch_id`` lineage; offsets live in ``checkpoint_dir`` so re-runs skip
    processed files (idempotent resume)."""
    from otar3088_spark.plans.kg_pipeline import build_kg

    stream = read_transcript_stream(spark, input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = build_kg(batch_df, dictionary, persist_spans=False)
        write_triples_batch(res.triples, batch_id, output_dir)

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_mention_rates(
    spark: SparkSession, input_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming windowed aggregation example over the transcript stream:
    mentions-bearing turns per (role, 5-minute window) with late-data
    tolerance via watermark. Returns the streaming DataFrame (caller attaches
    a sink); demonstrates the watermark+window surface of the engine."""
    stream = read_transcript_stream(spark, input_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.when(F.length("text") > 50, 1).otherwise(0)).alias("n_long_turns"),
        )
        .select(
            F.col("w")["start"].alias("window_start"),
            F.col("w")["end"].alias("window_end"),
            "role",
            "n_turns",
            "n_long_turns",
        )
    )
