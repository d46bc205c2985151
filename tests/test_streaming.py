"""Incremental-ingest (Structured Streaming availableNow) resume semantics."""

from __future__ import annotations

import pandas as pd


def _write_batch(spark, transcripts_pd: pd.DataFrame, path: str, lo: int, hi: int):
    sub = transcripts_pd[
        transcripts_pd["conv_id"].isin([f"conv_{i:06d}" for i in range(lo, hi)])
    ]
    spark.createDataFrame(sub).coalesce(1).write.mode("append").parquet(path)


def test_incremental_kg_update_resumes(spark, transcripts_pd, dictionary_pd, tmp_path):
    from otar3088_spark.streaming.ingest import incremental_kg_update

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    dictionary = spark.createDataFrame(dictionary_pd)

    # batch 1: conversations 0..19
    _write_batch(spark, transcripts_pd, input_dir, 0, 20)
    incremental_kg_update(spark, input_dir, dictionary, out_dir, ckpt)
    first = spark.read.parquet(out_dir)
    n1 = first.count()
    assert n1 > 0
    assert set(r["batch_id"] for r in first.select("batch_id").distinct().collect()) == {0}

    # re-run with NO new files: must be a no-op (exactly-once resume)
    incremental_kg_update(spark, input_dir, dictionary, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1

    # batch 2: conversations 20..39 -> only the new files are processed
    _write_batch(spark, transcripts_pd, input_dir, 20, 40)
    incremental_kg_update(spark, input_dir, dictionary, out_dir, ckpt)
    final = spark.read.parquet(out_dir)
    n2 = final.count()
    assert n2 > n1
    convs1 = {
        r["conv_id"]
        for r in final.filter("batch_id = 0").select("conv_id").distinct().collect()
    }
    assert all(int(c.split("_")[1]) < 20 for c in convs1)


def test_windowed_mention_rates_plan(spark, transcripts_pd, tmp_path):
    """The streaming windowed agg compiles and runs via availableNow into a
    memory sink (watermark + window surface)."""
    from otar3088_spark.streaming.ingest import windowed_mention_rates

    input_dir = str(tmp_path / "in2")
    _write_batch(spark, transcripts_pd, input_dir, 0, 10)
    agg = windowed_mention_rates(spark, input_dir)
    q = (
        agg.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM rates").collect()
    assert len(rows) > 0
    assert all(r["n_turns"] >= r["n_long_turns"] for r in rows)


def test_batch_write_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the same batch (crash between
    sink write and checkpoint commit) must not duplicate triples."""
    from pyspark.sql import functions as F

    from otar3088_spark.streaming.ingest import write_triples_batch

    out = str(tmp_path / "triples")
    t = spark.createDataFrame(
        [("a", "is_a", "X", "c1", 0, 0, 4), ("b", "is_a", "Y", "c1", 1, 0, 4)],
        "subj string, pred string, obj string, conv_id string, turn_idx int, "
        "span_start int, span_end int",
    )
    write_triples_batch(t, 7, out)
    n1 = spark.read.parquet(out).count()
    write_triples_batch(t, 7, out)  # replay of the SAME batch
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 2
    write_triples_batch(t, 8, out)  # a genuinely new batch appends
    assert spark.read.parquet(out).count() == 4
    assert {r["batch_id"] for r in spark.read.parquet(out).select("batch_id").distinct().collect()} == {7, 8}
