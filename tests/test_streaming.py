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

    # crash-mid-write replay: batch 9 first lands PARTIAL data (the crash
    # happened between sink write and checkpoint commit), then the stream
    # restarts and replays batch 9 with the full content. The dynamic
    # partition overwrite must fully replace the partial partition — no
    # union of partial+full, no duplicates, other batches untouched.
    partial = t.limit(1)
    write_triples_batch(partial, 9, out)
    assert spark.read.parquet(out).filter(F.col("batch_id") == 9).count() == 1
    write_triples_batch(t, 9, out)  # replay with the complete batch
    after = spark.read.parquet(out)
    assert after.filter(F.col("batch_id") == 9).count() == 2
    assert after.count() == 6  # 2+2+2, the partial row is gone
    got9 = {
        tuple(r) for r in after.filter(F.col("batch_id") == 9)
        .select("subj", "pred", "obj").collect()
    }
    assert got9 == {("a", "is_a", "X"), ("b", "is_a", "Y")}


def test_stateful_conversation_progress(spark, transcripts_pd, tmp_path):
    """applyInPandasWithState: per-conversation counters accumulate across
    micro-batches AND across separate availableNow runs (state store
    checkpointed with the stream)."""
    from otar3088_spark.streaming.ingest import read_transcript_stream
    from otar3088_spark.streaming.stateful import conversation_progress

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = read_transcript_stream(spark, input_dir)
        (
            conversation_progress(stream)
            .writeStream.format("parquet")
            .outputMode("append")  # parquet sink; update rows appended per batch
            .option("checkpointLocation", ckpt)
            .option("path", out_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    conv = "conv_000000"
    expected = transcripts_pd[transcripts_pd["conv_id"] == conv]

    _write_batch(spark, transcripts_pd, input_dir, 0, 10)
    run_once()
    _write_batch(spark, transcripts_pd, input_dir, 10, 20)  # new files, same convs absent
    # re-append conv 0..10 turns again? No — second batch holds convs 10..19;
    # state for conv_000000 must persist unchanged, conv_000010 appears new.
    run_once()

    out = spark.read.parquet(out_dir).toPandas()
    c0 = out[out["conv_id"] == conv].sort_values("total_turns")
    # conv_000000 was fully delivered in run 1
    assert int(c0["total_turns"].max()) == len(expected)
    assert int(c0["total_chars"].max()) == int(expected["text"].fillna("").str.len().sum())
    c10 = out[out["conv_id"] == "conv_000010"]
    exp10 = transcripts_pd[transcripts_pd["conv_id"] == "conv_000010"]
    assert int(c10["total_turns"].max()) == len(exp10)

    # third run with a REPEAT of conv_000000's rows: cumulative state grows
    _write_batch(spark, transcripts_pd, input_dir, 0, 1)
    run_once()
    out2 = spark.read.parquet(out_dir).toPandas()
    assert int(out2[out2["conv_id"] == conv]["total_turns"].max()) == 2 * len(expected)

def test_idle_conversation_state_eviction(spark, transcripts_pd, tmp_path):
    """GroupStateTimeout idle eviction: a conversation receiving no data for
    idle_timeout_ms is dropped at a later micro-batch — one final
    evicted=True row carries its totals out — and a later reappearance of
    the same conv_id starts counting from ZERO (state removed, not resumed).
    Runs under a paced processingTime trigger: availableNow drains must not
    use ProcessingTimeTimeout (see conversation_progress docstring)."""
    import time

    from otar3088_spark.streaming.ingest import read_transcript_stream
    from otar3088_spark.streaming.stateful import conversation_progress

    input_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    conv = "conv_000000"
    n = len(transcripts_pd[transcripts_pd["conv_id"] == conv])

    _write_batch(spark, transcripts_pd, input_dir, 0, 2)
    stream = read_transcript_stream(spark, input_dir)
    q = (
        conversation_progress(stream, idle_timeout_ms=50)
        .writeStream.format("memory")
        .queryName("evict_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        def rows_where(pred, deadline=90.0):
            t0 = time.time()
            while time.time() - t0 < deadline:
                rows = [
                    r
                    for r in spark.sql("SELECT * FROM evict_test").collect()
                    if pred(r)
                ]
                if rows:
                    return rows
                time.sleep(0.5)
            raise AssertionError("condition not reached before deadline")

        rows_where(lambda r: r["conv_id"] == conv and not r["evicted"])
        ev = rows_where(lambda r: r["conv_id"] == conv and r["evicted"])
        # the tombstone carries the final pre-eviction totals
        assert ev[0]["total_turns"] == n and ev[0]["batch_turns"] == 0
        # the conversation reappears -> counters restart from zero
        _write_batch(spark, transcripts_pd, input_dir, 0, 1)
        again = rows_where(
            lambda r: r["conv_id"] == conv and not r["evicted"]
        )
        totals = {r["total_turns"] for r in again}
        assert n in totals and 2 * n not in totals  # state was removed
    finally:
        q.stop()
