"""Span/triple evaluation — J10: pred-vs-gold matching as joins (metrics.py).

The reference scores NER with seqeval exact matching + nervaluate partial
overlap (metrics.py:20-40, 62-101). Spark-first:

* exact P/R/F1  — inner join on the full span key (doc, start, end, label)
  counts true positives; precision/recall from side counts.
* partial P/R   — interval-overlap join with the (doc) equi-prefix.
* triple P/R    — distinct-set join on (subj, pred, obj) — the BASELINE.json
  P/R >= 0.95 gate as a DataFrame op.

All return single-row DataFrames so they compose into metric sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEY = ["conv_id", "turn_idx", "sent_idx", "start", "end", "label"]


def _prf(tp: F.Column, n_pred: F.Column, n_gold: F.Column):
    p = F.when(n_pred > 0, tp / n_pred).otherwise(F.lit(0.0))
    r = F.when(n_gold > 0, tp / n_gold).otherwise(F.lit(0.0))
    f1 = F.when((p + r) > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return p, r, f1


def span_prf_exact(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Exact span-level P/R/F1 (seqeval 'strict' analogue)."""
    p = pred.select(*SPAN_KEY).distinct()
    g = gold.select(*SPAN_KEY).distinct()
    tp = p.join(g, SPAN_KEY, "inner").count()
    n_pred, n_gold = p.count(), g.count()
    spark = pred.sparkSession
    row = spark.createDataFrame([(tp, n_pred, n_gold)], ["tp", "n_pred", "n_gold"])
    pc, rc, f1 = _prf(F.col("tp").cast("double"), F.col("n_pred"), F.col("n_gold"))
    return row.select(
        "tp", "n_pred", "n_gold",
        F.round(pc, 6).alias("precision"),
        F.round(rc, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def span_prf_partial(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Partial-overlap P/R (nervaluate 'partial'): a predicted span counts if
    it overlaps any gold span of the same label in the same sentence.
    Interval-overlap join with equi-prefix keys (J8 shape)."""
    key = ["conv_id", "turn_idx", "sent_idx", "label"]
    p = pred.select(*SPAN_KEY).distinct().alias("p")
    g = gold.select(*SPAN_KEY).distinct().alias("g")
    cond = (
        (F.col("p.conv_id") == F.col("g.conv_id"))
        & (F.col("p.turn_idx") == F.col("g.turn_idx"))
        & (F.col("p.sent_idx") == F.col("g.sent_idx"))
        & (F.col("p.label") == F.col("g.label"))
        & (F.col("p.start") < F.col("g.end"))
        & (F.col("g.start") < F.col("p.end"))
    )
    matched_pred = p.join(g, cond, "left_semi").count()
    matched_gold = g.join(p, cond, "left_semi").count()
    n_pred, n_gold = p.count(), g.count()
    spark = pred.sparkSession
    row = spark.createDataFrame(
        [(matched_pred, matched_gold, n_pred, n_gold)],
        ["tp_pred", "tp_gold", "n_pred", "n_gold"],
    )
    return row.select(
        "tp_pred", "tp_gold", "n_pred", "n_gold",
        F.round(F.when(F.col("n_pred") > 0, F.col("tp_pred") / F.col("n_pred")).otherwise(0.0), 6).alias("precision"),
        F.round(F.when(F.col("n_gold") > 0, F.col("tp_gold") / F.col("n_gold")).otherwise(0.0), 6).alias("recall"),
    )


def triple_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Order-insensitive (subj, pred, obj) set P/R/F1 — the BASELINE gate."""
    key = ["subj", "pred", "obj"]
    p = pred.select(*key).distinct()
    g = gold.select(*key).distinct()
    tp = p.join(g, key, "inner").count()
    n_pred, n_gold = p.count(), g.count()
    spark = pred.sparkSession
    row = spark.createDataFrame([(tp, n_pred, n_gold)], ["tp", "n_pred", "n_gold"])
    pc, rc, f1 = _prf(F.col("tp").cast("double"), F.col("n_pred"), F.col("n_gold"))
    return row.select(
        "tp", "n_pred", "n_gold",
        F.round(pc, 6).alias("precision"),
        F.round(rc, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
