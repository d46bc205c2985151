"""Triple + graph materialization — stage P6.

Emits the relation families distilled from the reference (FIXTURES.md §4):

* ``(ent_id, 'is_a', label)``           — mention→type (dictionary semantics)
* ``(conv_id:turn_idx, 'mentions', cluster_id)`` — turn→entity
  (sentence-tagging lineage, COVID_ner_clean.ipynb cell 7)
* ``(surface_lower, 'linked_to', ent_id)``    — surface→dictionary link
  (labelstudio_e2e.py:196-240 lemma-dict linking)
* ``(ent_id, 'same_as', cluster_id)``   — canonicalization output
* ``(drug, 'causes', effect)``          — structured adverse-event triples
  (PHEE_datagen.ipynb cell 3, phee_builder.py:55-78)

plus ``nodes(id, kind)`` / ``graph_edges(src, rel, dst)`` graph tables.
All are distinct-projections/groupBys over the span table — pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRIPLE_COLS = ("subj", "pred", "obj", "conv_id", "turn_idx", "span_start", "span_end")

_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StructType([T.StructField("Drug", T.StringType())])),
        T.StructField(
            "Effect",
            T.StructType(
                [T.StructField("text", T.StringType()), T.StructField("start", T.IntegerType())]
            ),
        ),
    ]
)


def mention_triples(spans: DataFrame, clusters: DataFrame) -> DataFrame:
    """is_a / mentions / linked_to / same_as triples from resolved spans.

    ``spans``: output of resolve_labels (conv_id, turn_idx, sent_idx, start,
    end, surface, term, label, ent_id). ``clusters``: (ent_id, cluster_id).

    Emitted as ONE pass: each span row fans out into up to four triple
    structs via a literal array + explode — a union of four projections
    would recompute the (expensive) span DAG four times, this computes it
    once and lets the final dedup be the only shuffle.
    """
    s = spans.join(F.broadcast(clusters), "ent_id", "left").withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("ent_id"))
    )
    locator = F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string"))

    def trip(subj, pred, obj):
        return F.struct(
            subj.cast("string").alias("subj"),
            F.lit(pred).alias("pred"),
            obj.cast("string").alias("obj"),
        )

    fan = F.array(
        trip(F.col("ent_id"), "is_a", F.col("label")),
        trip(locator, "mentions", F.col("cluster_id")),
        trip(F.lower(F.col("surface")), "linked_to", F.col("ent_id")),
        F.when(
            F.col("ent_id") != F.col("cluster_id"),
            trip(F.col("ent_id"), "same_as", F.col("cluster_id")),
        ),
    )
    return (
        s.select(
            F.col("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.col("start").cast("int").alias("span_start"),
            F.col("end").cast("int").alias("span_end"),
            F.explode(F.filter(fan, lambda t: t.isNotNull())).alias("t"),
        )
        .select(
            F.col("t")["subj"].alias("subj"),
            F.col("t")["pred"].alias("pred"),
            F.col("t")["obj"].alias("obj"),
            "conv_id",
            "turn_idx",
            "span_start",
            "span_end",
        )
        .dropDuplicates(["subj", "pred", "obj", "conv_id", "turn_idx", "span_start", "span_end"])
    )


def causes_triples(events: DataFrame) -> DataFrame:
    """(drug, 'causes', effect) from PHEE-shaped structured events.

    Only ``Adverse_event`` rows yield triples; rows with no parsed Effect
    pass through silently (PHEE_datagen.ipynb cell 3 malformed-case rule).
    ``from_json`` replaces the reference's per-row ``json.loads``.
    """
    parsed = events.filter(F.col("event_type") == "Adverse_event").withColumn(
        "ev", F.from_json(F.col("event_data"), _EVENT_SCHEMA)
    )
    ok = parsed.filter(
        F.col("ev.subject.Drug").isNotNull() & F.col("ev.Effect.text").isNotNull()
    )
    # one row per (triple, turn): min span_start makes the survivor
    # DETERMINISTIC — dropDuplicates on a key subset keeps whichever row a
    # task sees first, so the surviving span_start would vary with
    # partitioning/run order (mention_triples dedups on all TRIPLE_COLS for
    # the same reason)
    return (
        ok.select(
            F.col("ev.subject.Drug").alias("subj"),
            F.lit("causes").alias("pred"),
            F.col("ev.Effect.text").alias("obj"),
            F.col("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.col("ev.Effect.start").cast("int").alias("span_start"),
        )
        .groupBy("subj", "pred", "obj", "conv_id", "turn_idx")
        .agg(F.min("span_start").alias("span_start"))
        .withColumn("span_end", F.lit(None).cast("int"))
    )


def graph_tables(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project (nodes, edges) graph tables from the triple table.

    Node kinds are derived STRUCTURALLY from the predicate that produced
    each id — not from id-shape regexes, which silently misclassified any
    corpus whose conv_ids don't match a hardcoded prefix (a 'fuzz_0000:3'
    turn locator is a turn because it is the subject of a ``mentions``
    triple, whatever it looks like). An id appearing in several roles takes
    the highest-priority kind (entity > turn > label > literal) so e.g. a
    cluster id that is both ``mentions``-object and ``same_as``-object is
    one 'entity' node."""
    pred = F.col("pred")
    subj_kind = (
        F.when(pred == "mentions", "turn")
        .when(pred.isin("is_a", "same_as"), "entity")
        .otherwise("literal")  # linked_to surface forms, causes drugs
    )
    obj_kind = (
        F.when(pred == "is_a", "label")
        .when(pred.isin("mentions", "same_as", "linked_to"), "entity")
        .otherwise("literal")  # causes effects
    )
    pairs = triples.select(F.col("subj").alias("id"), subj_kind.alias("kind")).union(
        triples.select(F.col("obj").alias("id"), obj_kind.alias("kind"))
    )
    rank = F.expr(
        "map_from_arrays(array('entity','turn','label','literal'), array(0,1,2,3))"
    )
    nodes = (
        pairs.groupBy("id")
        .agg(F.min(F.struct(F.try_element_at(rank, F.col("kind")).alias("r"),
                            F.col("kind").alias("k"))).alias("m"))
        .select("id", F.col("m")["k"].alias("kind"))
    )
    edges = triples.select(
        F.col("subj").alias("src"), F.col("pred").alias("rel"), F.col("obj").alias("dst")
    ).distinct()
    return nodes, edges
