"""Model-scored mention detection — the sanctioned ``mapInPandas`` surface (M1).

The reference runs HF token-classification in a torch ``no_grad`` loop at
batch_size=4 (model_tests.ipynb cell 6; trial_to_papers.ipynb cell 12). The
Spark-first shape is an Arrow-batched ``mapInPandas`` with a per-executor
model singleton: one Python worker per task, model loaded once per executor
process, batches sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

This container has no torch/transformers, so the default scorer is a
DETERMINISTIC STAND-IN (hash-based pseudo-logits over token spans) behind the
exact same UDF signature — CI-friendly, and a real HF pipeline plugs in by
passing ``scorer=``. The BIO-decode + ``##``-subword-merge semantics (F19,
trial_to_papers.ipynb cell 11) live in plain Python *inside the batch*, which
is the sanctioned place for them (SURVEY.md §2.9).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MENTION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("sent_idx", T.IntegerType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

_LABELS = ("CellLine", "CellType", "Tissue", "Drug", "AdverseEvent")

# per-executor-process singleton slot (the 'model' in a real deployment)
_MODEL_SINGLETON: dict[str, object] = {}


def _stand_in_scorer(sentences: pd.Series) -> list[list[tuple[int, int, str, float]]]:
    """Deterministic pseudo-model: 'detects' a span for tokens whose md5 has
    a low nibble, labeling by hash bucket. Stable across runs/partitions."""
    out: list[list[tuple[int, int, str, float]]] = []
    for sent in sentences:
        spans: list[tuple[int, int, str, float]] = []
        cur = 0
        for tok in sent.split(" "):
            if len(tok) >= 4:
                h = hashlib.md5(tok.lower().encode()).digest()
                if h[0] < 16:  # ~6% of tokens
                    label = _LABELS[h[1] % len(_LABELS)]
                    score = 0.5 + (h[2] / 512.0)
                    spans.append((cur, cur + len(tok), label, round(score, 4)))
            cur += len(tok) + 1
        out.append(spans)
    return out


def model_mentions(
    sentences: DataFrame,
    scorer: Callable[[pd.Series], list[list[tuple[int, int, str, float]]]] | None = None,
    batch_key: str = "default",
) -> DataFrame:
    """Batched model inference over sentence rows -> mention spans.

    ``scorer(sent_texts) -> [[(start, end, label, score), ...], ...]`` is
    loaded once per executor process (singleton dict) — swapping in a real
    HF ``pipeline("token-classification")`` changes nothing structurally.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _MODEL_SINGLETON.get(batch_key)
        if model is None:
            model = scorer or _stand_in_scorer
            _MODEL_SINGLETON[batch_key] = model
        for pdf in batches:
            if pdf.empty:
                continue
            preds = model(pdf["sent_text"])
            rows = []
            for (conv_id, turn_idx, sent_idx, sent_text), spans in zip(
                pdf[["conv_id", "turn_idx", "sent_idx", "sent_text"]].itertuples(
                    index=False, name=None
                ),
                preds,
            ):
                for s, e, lab, sc in spans:
                    rows.append(
                        (conv_id, int(turn_idx), int(sent_idx), int(s), int(e),
                         sent_text[s:e], lab, float(sc))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MENTION_SCHEMA.fields])

    cols = ["conv_id", "turn_idx", "sent_idx", "sent_text"]
    return sentences.select(*cols).mapInPandas(run, schema=MENTION_SCHEMA)


def merge_mentions(dict_spans: DataFrame, model_spans: DataFrame) -> DataFrame:
    """U1 union of dictionary + model mentions with dictionary priority on
    exact (start, end) collision (reference resolves conflicts by source
    precedence, entity_processor.py:86-101)."""
    from pyspark.sql import functions as F

    d = dict_spans.select(
        "conv_id", "turn_idx", "sent_idx", "start", "end", "surface", "label",
        F.lit("dict").alias("source"), F.lit(1.0).alias("score"),
    )
    m = model_spans.select(
        "conv_id", "turn_idx", "sent_idx", "start", "end", "surface", "label",
        F.lit("model").alias("source"), F.col("score"),
    )
    overlap_free_model = m.join(
        d.select("conv_id", "turn_idx", "sent_idx", "start", "end"),
        ["conv_id", "turn_idx", "sent_idx", "start", "end"],
        "left_anti",
    )
    return d.unionByName(overlap_free_model)
