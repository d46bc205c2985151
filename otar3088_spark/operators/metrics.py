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
    """Exact span-level P/R/F1 (seqeval 'strict' analogue).

    Both sides are persisted across the three counting actions: pred/gold
    are typically full pipeline outputs, and without the cache each action
    re-executes the whole upstream extraction DAG."""
    p = pred.select(*SPAN_KEY).distinct().persist()
    g = gold.select(*SPAN_KEY).distinct().persist()
    tp = p.join(g, SPAN_KEY, "inner").count()
    n_pred, n_gold = p.count(), g.count()
    p.unpersist()
    g.unpersist()
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
    # persisted for the same reason as span_prf_exact: four actions follow
    p = pred.select(*SPAN_KEY).distinct().persist().alias("p")
    g = gold.select(*SPAN_KEY).distinct().persist().alias("g")
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
    p.unpersist()
    g.unpersist()
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


def _classify_side(left: DataFrame, right: DataFrame, group_label: bool) -> DataFrame:
    """Classify every LEFT span against the RIGHT side: one row per left span
    with flags (exact boundary match, exact+label, any overlap, overlap+label).
    Overlap join uses the sentence equi-prefix (J8 shape, never cartesian)."""
    l = left.select(*SPAN_KEY).distinct().alias("l")
    r = right.select(*SPAN_KEY).distinct().alias("r")
    cond = (
        (F.col("l.conv_id") == F.col("r.conv_id"))
        & (F.col("l.turn_idx") == F.col("r.turn_idx"))
        & (F.col("l.sent_idx") == F.col("r.sent_idx"))
        & (F.col("l.start") < F.col("r.end"))
        & (F.col("r.start") < F.col("l.end"))
    )
    if group_label:
        # per-entity mode mirrors nervaluate's per-type tables: both sides
        # are restricted to the same entity type before matching
        cond = cond & (F.col("l.label") == F.col("r.label"))
    j = l.join(r, cond, "left")
    exact = (F.col("l.start") == F.col("r.start")) & (F.col("l.end") == F.col("r.end"))
    lab_eq = F.col("l.label") == F.col("r.label")
    keys = [F.col(f"l.{c}") for c in SPAN_KEY]
    return (
        j.groupBy(*keys)
        .agg(
            F.max(F.coalesce(exact, F.lit(False))).alias("exact"),
            F.max(F.coalesce(exact & lab_eq, F.lit(False))).alias("exact_lab"),
            F.max(F.col("r.start").isNotNull()).alias("ov"),
            F.max(F.coalesce(lab_eq, F.lit(False))).alias("ov_lab"),
        )
        .withColumn("grp", F.col("label") if group_label else F.lit("ALL"))
    )


def nervaluate_4way(
    pred: DataFrame, gold: DataFrame, per_label: bool = False
) -> DataFrame:
    """nervaluate-style 4-schema span evaluation (reference metrics.py:62-101,
    133-195): one row per schema in {strict, exact, partial, ent_type}
    (× entity label when ``per_label``) with COR/INC/PAR/MIS/SPU counts and
    precision/recall/F1 (partial matches weighted 0.5).

    Schema rules per classified span:
      strict   — COR: exact boundaries + same label; INC: any other overlap
      exact    — COR: exact boundaries (label ignored); INC: partial overlap
      partial  — COR: exact boundaries; PAR: partial overlap (weight 0.5)
      ent_type — COR: any overlap with same label;   INC: overlap, wrong label
      no overlap at all — SPU (pred side) / MIS (gold side)

    Precision is computed from the prediction-side classification, recall
    from the gold-side classification; when the pred↔gold overlap pairing is
    1:1 (the common case — pipeline output has non-overlapping spans per
    sentence) this coincides exactly with nervaluate's paired counting.
    Everything is two overlap joins + small aggregates — no driver loops.
    """
    schemas = ("strict", "exact", "partial", "ent_type")

    def melt(side: DataFrame) -> DataFrame:
        def flags(schema):
            e, el, ov, ovl = (F.col("exact"), F.col("exact_lab"), F.col("ov"), F.col("ov_lab"))
            if schema == "strict":
                cor, par = el, F.lit(False)
                inc = ov & ~el
            elif schema == "exact":
                cor, par = e, F.lit(False)
                inc = ov & ~e
            elif schema == "partial":
                cor, par = e, ov & ~e
                inc = F.lit(False)
            else:  # ent_type
                cor, par = ovl, F.lit(False)
                inc = ov & ~ovl
            return F.struct(
                F.lit(schema).alias("schema"),
                cor.cast("int").alias("cor"),
                inc.cast("int").alias("inc"),
                par.cast("int").alias("par"),
                (~F.col("ov")).cast("int").alias("unmatched"),
            )

        fan = F.array(*[flags(s) for s in schemas])
        return (
            side.select("grp", F.explode(fan).alias("s"))
            .groupBy("grp", F.col("s")["schema"].alias("schema"))
            .agg(
                F.sum(F.col("s")["cor"]).alias("cor"),
                F.sum(F.col("s")["inc"]).alias("inc"),
                F.sum(F.col("s")["par"]).alias("par"),
                F.sum(F.col("s")["unmatched"]).alias("unmatched"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    p_side = melt(_classify_side(pred, gold, per_label))
    g_side = melt(_classify_side(gold, pred, per_label)).select(
        "grp", "schema",
        F.col("cor").alias("g_cor"), F.col("par").alias("g_par"),
        F.col("unmatched").alias("mis"), F.col("n").alias("possible"),
    )
    out = p_side.withColumnRenamed("unmatched", "spu").withColumnRenamed(
        "n", "actual"
    ).join(g_side, ["grp", "schema"], "full_outer").na.fill(0)
    prec = F.when(
        F.col("actual") > 0, (F.col("cor") + 0.5 * F.col("par")) / F.col("actual")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("possible") > 0,
        (F.col("g_cor") + 0.5 * F.col("g_par")) / F.col("possible"),
    ).otherwise(F.lit(0.0))
    f1 = F.when((prec + rec) > 0, 2 * prec * rec / (prec + rec)).otherwise(F.lit(0.0))
    return out.select(
        F.col("grp").alias("label"),
        "schema", "cor", "inc", "par", "mis", "spu", "actual", "possible",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def triple_prf(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Order-insensitive (subj, pred, obj) set P/R/F1 — the BASELINE gate."""
    key = ["subj", "pred", "obj"]
    p = pred.select(*key).distinct().persist()
    g = gold.select(*key).distinct().persist()
    tp = p.join(g, key, "inner").count()
    n_pred, n_gold = p.count(), g.count()
    p.unpersist()
    g.unpersist()
    spark = pred.sparkSession
    row = spark.createDataFrame([(tp, n_pred, n_gold)], ["tp", "n_pred", "n_gold"])
    pc, rc, f1 = _prf(F.col("tp").cast("double"), F.col("n_pred"), F.col("n_gold"))
    return row.select(
        "tp", "n_pred", "n_gold",
        F.round(pc, 6).alias("precision"),
        F.round(rc, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )
