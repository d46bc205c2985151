"""LabelStudio JSON source/sink — K4 + the nested annotation schema (§1.2).

Reference shape (labelstudio_e2e.py:230-253):
``{"data": {"text": ...}, "annotations": [{"result": [{"value": {"start",
"end", "text", "labels": [label]}}]}]}``. Spark-first: ``to_json(struct(...))``
writer and ``from_json`` reader over the declared nested schema — the
reference's per-row ``json.dump`` loop becomes one expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LS_SCHEMA = T.StructType(
    [
        T.StructField("data", T.StructType([T.StructField("text", T.StringType())])),
        T.StructField(
            "annotations",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "result",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "value",
                                            T.StructType(
                                                [
                                                    T.StructField("start", T.IntegerType()),
                                                    T.StructField("end", T.IntegerType()),
                                                    T.StructField("text", T.StringType()),
                                                    T.StructField(
                                                        "labels", T.ArrayType(T.StringType())
                                                    ),
                                                ]
                                            ),
                                        )
                                    ]
                                )
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)


def ls_json_lines(sent_spans: DataFrame) -> DataFrame:
    """K4 sink: per-sentence span rows -> one LabelStudio JSON line per
    sentence. Input grain: (conv_id, turn_idx, sent_idx, sent_text, start,
    end, surface, label). Write with ``.select("value").write.text(...)``."""
    g = sent_spans.groupBy("conv_id", "turn_idx", "sent_idx", "sent_text").agg(
        F.collect_list(
            F.struct(
                F.struct(
                    F.col("start").alias("start"),
                    F.col("end").alias("end"),
                    F.col("surface").alias("text"),
                    F.array(F.col("label")).alias("labels"),
                ).alias("value")
            )
        ).alias("result")
    )
    doc = F.struct(
        F.struct(F.col("sent_text").alias("text")).alias("data"),
        F.array(F.struct(F.col("result").alias("result"))).alias("annotations"),
    )
    return g.select(
        "conv_id", "turn_idx", "sent_idx", F.to_json(doc).alias("value")
    )


def parse_ls_json(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Reader: LabelStudio JSON lines -> flattened span rows (text, start,
    end, surface, label). Inverse of ls_json_lines modulo keys.

    Unannotated tasks (empty/null ``annotations`` or ``result`` — real
    exports contain them for skipped documents) are PRESERVED as one row
    with null span columns: an inner explode would silently drop their text
    from any corpus-level consumer. Filter ``start IS NOT NULL`` for
    span-only use."""
    p = df.withColumn("j", F.from_json(F.col(json_col), LS_SCHEMA))
    ex = p.select(
        F.col("j")["data"]["text"].alias("text"),
        F.explode_outer(F.col("j")["annotations"]).alias("ann"),
    ).select("text", F.explode_outer(F.col("ann")["result"]).alias("r"))
    return ex.select(
        "text",
        F.col("r")["value"]["start"].alias("start"),
        F.col("r")["value"]["end"].alias("end"),
        F.col("r")["value"]["text"].alias("surface"),
        F.element_at(F.col("r")["value"]["labels"], 1).alias("label"),
    )
