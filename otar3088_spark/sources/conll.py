"""CoNLL source/sink — S4 scan + K2 sink as DataFrame ops.

The reference reads token<TAB>tag lines with blank-line sentence boundaries
in a Python loop (file_readers.py:90-132) and writes them back the same way
(file_writers.py:39-79). Spark-first: ``spark.read.text`` keeps file order
only *within* a file via a monotonic id per partition — we recover sentence
grouping with a running blank-line count over a per-file window, then
``groupBy.agg(collect_list)``. For multi-file corpora each file is an
independent window partition (``input_file_name``), so ordering is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """-> (file, sent_id, tokens array<string>, tags array<string>)."""
    raw = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.monotonically_increasing_id().alias("rid"),
            F.col("value"),
        )
    )
    w = Window.partitionBy("file").orderBy("rid")
    lined = raw.withColumn("is_blank", F.trim(F.col("value")) == "").withColumn(
        "sent_id", F.sum(F.when(F.col("is_blank"), 1).otherwise(0)).over(w)
    )
    toks = lined.filter(~F.col("is_blank")).select(
        "file",
        "sent_id",
        "rid",
        F.split(F.col("value"), sep).getItem(0).alias("token"),
        F.split(F.col("value"), sep).getItem(1).alias("tag"),
    )
    return (
        toks.groupBy("file", "sent_id")
        .agg(F.sort_array(F.collect_list(F.struct("rid", "token", "tag"))).alias("z"))
        .select(
            "file",
            "sent_id",
            F.transform("z", lambda s: s["token"]).alias("tokens"),
            F.transform("z", lambda s: s["tag"]).alias("tags"),
        )
    )


def conll_lines(iob: DataFrame, sep: str = "\t") -> DataFrame:
    """K2 sink: token/tag arrays -> one text row per sentence (token<sep>tag
    lines joined by \\n). Each value ends with a trailing \\n so the text
    writer's own newline produces the BLANK line that separates sentences —
    without it consecutive sentences run together and a CoNLL reader (ours
    included) merges every sentence in the file into one. Write with
    ``df.select("value").write.text(path)``; round-trips through
    ``read_conll``."""
    return iob.select(
        F.concat(
            F.concat_ws(
                "\n",
                F.zip_with("tokens", "tags", lambda t, g: F.concat_ws(sep, t, g)),
            ),
            F.lit("\n"),
        ).alias("value")
    )
