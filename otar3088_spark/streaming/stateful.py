"""Custom stateful streaming operator — ``applyInPandasWithState`` surface.

The reference has no streaming, but a transcript KG deployed on live
conversations needs per-conversation running state: how many turns/mentions
a conversation has accumulated so far decides when to (re)extract its
subgraph. ``conversation_progress`` keeps that state in the streaming state
store, keyed by ``conv_id``:

* state: (n_turns, n_chars, last_turn_idx) per conversation — survives
  micro-batches AND restarts (checkpointed with the stream);
* output: one row per (conversation × micro-batch) with cumulative totals;
* grouping keys hash-partition across executors; Arrow-batched pandas on
  each group — the sanctioned stateful-Python surface (no per-row rounds).

Pairs with ``ingest.incremental_kg_update``: availableNow runs drain the
new files, update conversation state, and emit only conversations whose
totals changed — the incremental-work signal for downstream re-extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("total_turns", T.LongType()),
        T.StructField("total_chars", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
        T.StructField("batch_turns", T.LongType()),
        # True on the final row emitted when an idle conversation's state is
        # evicted by the processing-time timeout (idle_timeout_ms)
        T.StructField("evicted", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("max_turn_idx", T.IntegerType()),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # idle eviction: emit a tombstone row with the final totals and
            # drop the state — unbounded-state-growth guard for long-lived
            # streams over ever-churning conversation ids
            n_turns, n_chars, max_idx = state.get if state.exists else (0, 0, -1)
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "total_turns": n_turns,
                        "total_chars": n_chars,
                        "max_turn_idx": max_idx,
                        "batch_turns": 0,
                        "evicted": True,
                    }
                ]
            )
            return
        n_turns, n_chars, max_idx = state.get if state.exists else (0, 0, -1)
        batch_turns = 0
        for pdf in pdfs:
            batch_turns += len(pdf)
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_chars, max_idx))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "conv_id": conv_id,
                    "total_turns": n_turns,
                    "total_chars": n_chars,
                    "max_turn_idx": max_idx,
                    "batch_turns": batch_turns,
                    "evicted": False,
                }
            ]
        )

    return update


def conversation_progress(
    stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-conversation cumulative progress over a transcript stream.

    ``stream`` is a streaming DataFrame with at least
    (conv_id, turn_idx, text). Returns a streaming DataFrame of cumulative
    per-conversation totals; the state store carries the counters across
    micro-batches and restarts. Output mode is append — each emitted row is
    a final per-(conversation, micro-batch) fact ("totals as of this
    batch"), which file sinks support directly.

    ``idle_timeout_ms``: when set, conversations receiving no data for that
    long (processing time) are EVICTED at the next micro-batch — one final
    ``evicted=True`` row carries their totals out, the state is removed, and
    a later reappearance of the conv_id starts counting from zero. Without
    it the state store grows monotonically with distinct conversation ids
    (fine for bounded corpora; not for an unbounded live stream).

    Use idle eviction only with a PACED trigger (processingTime/continuous
    deployment). An ``availableNow`` drain combined with
    ProcessingTimeTimeout never self-terminates: the multi-batch executor
    keeps scheduling timeout-check batches after the source is exhausted
    (observed on Spark 4.1 — the stateful operator always reports another
    batch may be required). Batch drains should keep the default NoTimeout."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_update(idle_timeout_ms),
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
