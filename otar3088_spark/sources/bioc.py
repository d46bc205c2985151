"""BioC-JSON source — S12 (reference trial_to_paper_utils.py:87-105
``query_bioc``: nested collection → documents → passages walk in per-row
Python; here one ``spark.read.json`` + two explodes).

The BioC REST payload is a JSON array of collections, each carrying
``documents[] → passages[]`` where a passage has ``infons.section_type``,
``offset`` and ``text`` (and optionally ``annotations[]`` with typed
character locations). Reading it Spark-first means the nested walk is a
declarative explode chain — schema'd, pushdown-friendly, and parallel over
files — instead of a driver loop per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BIOC_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField(
                "documents",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("id", T.StringType()),
                            T.StructField(
                                "passages",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "infons",
                                                T.StructType(
                                                    [T.StructField("section_type", T.StringType())]
                                                ),
                                            ),
                                            T.StructField("offset", T.LongType()),
                                            T.StructField("text", T.StringType()),
                                            T.StructField(
                                                "annotations",
                                                T.ArrayType(
                                                    T.StructType(
                                                        [
                                                            T.StructField("id", T.StringType()),
                                                            T.StructField(
                                                                "infons",
                                                                T.StructType(
                                                                    [T.StructField("type", T.StringType())]
                                                                ),
                                                            ),
                                                            T.StructField("text", T.StringType()),
                                                            T.StructField(
                                                                "locations",
                                                                T.ArrayType(
                                                                    T.StructType(
                                                                        [
                                                                            T.StructField("offset", T.LongType()),
                                                                            T.StructField("length", T.LongType()),
                                                                        ]
                                                                    )
                                                                ),
                                                            ),
                                                        ]
                                                    )
                                                ),
                                            ),
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            )
        ]
    )
)


def read_bioc_passages(spark: SparkSession, path: str) -> DataFrame:
    """One row per passage: ``(doc_id, passage_idx, section_type, offset,
    text)``. Each input line is one BioC response (a JSON array of
    collections) — the standard dump format for the reference's per-PMID
    fetch loop."""
    return _passages(spark, path).select(
        "doc_id",
        "passage_idx",
        F.col("p")["infons"]["section_type"].alias("section_type"),
        F.col("p")["offset"].alias("offset"),
        F.col("p")["text"].alias("text"),
    )


def _passages(spark: SparkSession, path: str) -> DataFrame:
    """Shared raw -> collection -> documents -> passages explode chain."""
    raw = spark.read.text(path).select(
        F.from_json(F.col("value"), BIOC_SCHEMA).alias("coll")
    )
    return (
        raw.select(F.explode("coll").alias("c"))
        .select(F.explode(F.col("c")["documents"]).alias("d"))
        .select(
            F.col("d")["id"].alias("doc_id"),
            F.posexplode(F.col("d")["passages"]).alias("passage_idx", "p"),
        )
    )


def read_bioc_annotations(spark: SparkSession, path: str) -> DataFrame:
    """One row per annotation span: ``(doc_id, passage_idx, ann_id, ann_type,
    start, end, text)`` with offsets document-absolute (BioC convention).
    Discontinuous annotations (multiple locations) collapse to the covering
    extent — first location's start, last location's end — the same
    convention the BRAT reader applies to discontinuous ``;`` spans."""
    anns = (
        _passages(spark, path)
        .select(
            "doc_id",
            "passage_idx",
            F.explode(F.col("p")["annotations"]).alias("a"),
        )
        # a JSON null INSIDE an annotations array explodes to a NULL element
        # (explode drops null/empty ARRAYS, not null members) and would
        # surface as an all-null annotation row
        .filter(F.col("a").isNotNull())
    )
    loc1 = F.element_at(F.col("a")["locations"], 1)
    locN = F.element_at(F.col("a")["locations"], -1)
    return anns.select(
        "doc_id",
        "passage_idx",
        F.col("a")["id"].alias("ann_id"),
        F.col("a")["infons"]["type"].alias("ann_type"),
        loc1["offset"].cast("int").alias("start"),
        (locN["offset"] + locN["length"]).cast("int").alias("end"),
        F.col("a")["text"].alias("text"),
    )


def bioc_to_transcripts(passages: DataFrame) -> DataFrame:
    """Adapt BioC passages onto the engine's transcript grain: doc → conv,
    passage → turn (the same mapping the SURVEY gives HF datasets)."""
    return passages.select(
        F.col("doc_id").alias("conv_id"),
        F.col("passage_idx").cast("int").alias("turn_idx"),
        F.lit("passage").alias("role"),
        F.col("text"),
        F.col("section_type").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
