"""BRAT source — S3 scan: paired ``.txt``/``.ann`` standoff files.

Reference parser: file_readers.py:14-85 (``load_brat``/``_read_brat``) reads
``T<i>\\t<label> <start> <end>\\t<term>`` rows, taking first/last offsets of
discontinuous spans (``"0 10;12 15"`` -> 0, 15; file_readers.py:65-69).
Spark-first: two ``spark.read.text`` scans joined on the file stem extracted
with ``input_file_name`` + ``regexp_extract`` (F21), ``.ann`` rows parsed with
split/regexp — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STEM = r"([^/]+)\.[^./]+$"


def read_brat(spark: SparkSession, input_dir: str) -> tuple[DataFrame, DataFrame]:
    """-> (docs(doc_id, text), anns(doc_id, ann_id, label, start, end, term)).

    Discontinuous spans collapse to (first_start, last_end) per the reference.
    """
    docs = (
        spark.read.text(f"{input_dir}/*.txt", wholetext=True)
        .select(
            F.regexp_extract(F.input_file_name(), _STEM, 1).alias("doc_id"),
            F.col("value").alias("text"),
        )
    )
    raw = spark.read.text(f"{input_dir}/*.ann").select(
        F.regexp_extract(F.input_file_name(), _STEM, 1).alias("doc_id"),
        F.col("value"),
    )
    parts = F.split(F.col("value"), "\t")
    mid = F.split(parts.getItem(1), " ")
    offsets = F.concat_ws(" ", F.slice(mid, 2, F.greatest(F.size(mid) - 1, F.lit(0))))
    anns = (
        raw.filter(F.col("value").startswith("T"))
        .select(
            "doc_id",
            parts.getItem(0).alias("ann_id"),
            mid.getItem(0).alias("label"),
            F.regexp_extract(offsets, r"^(\d+)", 1).cast("int").alias("start"),
            F.regexp_extract(offsets, r"(\d+)$", 1).cast("int").alias("end"),
            parts.getItem(2).alias("term"),
        )
    )
    return docs, anns


def ann_lines(anns: DataFrame) -> DataFrame:
    """K3 sink: annotation rows back to BRAT ``.ann`` text lines
    (cellfinder_clean.ipynb cell 10)."""
    return anns.select(
        F.col("doc_id"),
        F.concat_ws(
            "\t",
            F.col("ann_id"),
            F.concat_ws(" ", F.col("label"), F.col("start").cast("string"), F.col("end").cast("string")),
            F.col("term"),
        ).alias("value"),
    )
