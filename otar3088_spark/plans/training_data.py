"""Training-dataset assembly: spans -> IOB -> encoded, split, sharded HF
dataset directory.

This is the DATA side of the reference's NER training stack — what
``dataset_loader.py`` does before the HF Trainer takes over (IOB alignment,
label encoding, train/val split ``train_test_split(seed=42)``, optional
gazetteer augmentation `dataset_loader.py:409-433`, then
``_push_ds_to_hub`` `brat_processor.py:110-119`) — composed from the
engine's own operators (J9 spans_to_iob, P9 filter_all_o, M5 encode_labels,
M6 train_val_split, M4 augment_with_gazetteer, K5 write_hf_dataset) as one
Spark plan. The trainer itself stays out of scope (SURVEY §7.4): the
OUTPUT of this plan is the frozen artifact a GPU box consumes with
``datasets.load_dataset(out_dir)``.

Scale posture: everything is per-sentence narrow work plus the splits'
parquet writes; the only aggregation is spans_to_iob's per-sentence span
collect (one shuffle, already co-partitioned with the tagging output). The
label-set collect is a bounded driver fetch of a tiny dim (labels are a
closed annotation vocabulary, <=dozens) — same sanctioned class as the
tagging anchor IN-set. The plan has THREE consumers of the IOB table
(label derivation, train write, val write); pass ``staging_dir`` at scale
so the upstream tagging DAG executes once into a parquet snapshot instead
of three times — the same pattern as build_kg's span staging.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otar3088_spark.operators.labelset import encode_labels, train_val_split
from otar3088_spark.operators.spans import filter_all_o, spans_to_iob
from otar3088_spark.sources.hf_dataset import write_hf_dataset


def label_map(labels: list[str]) -> dict[str, int]:
    """IOB label vocabulary -> contiguous ids, HF token-classification
    convention: O=0, then B-X/I-X pairs in sorted label order."""
    out = {"O": 0}
    for lab in sorted(labels):
        out[f"B-{lab}"] = len(out)
        out[f"I-{lab}"] = len(out)
    return out


def build_ner_dataset(
    sentences: DataFrame,
    spans: DataFrame,
    out_dir: str,
    labels: list[str] | None = None,
    val_fraction: float = 0.2,
    seed: int = 42,
    gazetteer: DataFrame | None = None,
    p_swap: float = 0.0,
    drop_all_o: bool = True,
    num_shards: int | None = None,
    staging_dir: str | None = None,
) -> dict:
    """Assemble a token-classification dataset directory from tagged spans.

    ``sentences``: (conv_id, turn_idx, sent_idx, sent_text) — the
    sentencize output; ``spans``: tag_mentions/merged spans over them.
    Writes ``train``/``validation`` splits of
    (conv_id, turn_idx, sent_idx, tokens, ner_tags) to ``out_dir`` in the
    hub layout (K5) and returns a manifest
    ``{label2id, train_shards, val_shards}``.

    ``labels=None`` derives the vocabulary from the IOB tags (bounded
    driver fetch of a tiny dim). ``gazetteer`` + ``p_swap`` enable the
    reference's stochastic same-type entity substitution on the TRAIN
    split only (`data_augmentation.py:118-181`, seeded — deterministic
    re-runs). All-O sentences are dropped by default
    (`dataset_loader.py` keeps only annotated sentences; P9).
    ``staging_dir`` snapshots the IOB table to parquet so the upstream
    tagging DAG runs once, not once per consumer (see module docstring).
    """
    iob = spans_to_iob(sentences, spans)
    if drop_all_o:
        iob = filter_all_o(iob)
    if staging_dir is not None:
        snap = os.path.join(staging_dir, f"iob_{uuid.uuid4().hex[:12]}")
        iob.write.mode("overwrite").parquet(snap)
        iob = sentences.sparkSession.read.parquet(snap)

    if labels is None:
        labels = sorted(
            {
                r["l"]
                for r in iob.select(F.explode("tags").alias("t"))
                .filter(F.col("t") != "O")
                .select(F.regexp_replace("t", "^[BI]-", "").alias("l"))
                .distinct()
                .collect()
            }
        )
    label2id = label_map(list(labels))

    # key-hash split: membership is a function of the sentence key alone,
    # so re-runs at ANY partitioning/cluster size produce the same artifact
    train, val = train_val_split(
        iob,
        val_fraction=val_fraction,
        seed=seed,
        key_cols=("conv_id", "turn_idx", "sent_idx"),
    )
    if gazetteer is not None and p_swap > 0.0:
        from otar3088_spark.operators.augment import augment_with_gazetteer

        train = augment_with_gazetteer(
            train, gazetteer, p_swap=p_swap, seed=seed
        ).drop("augmented")

    def encoded(df: DataFrame) -> DataFrame:
        return encode_labels(df, label2id).select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            "tokens",
            F.col("tags_ids").alias("ner_tags"),
        )

    # validate BOTH splits before writing EITHER: write_hf_dataset refuses an
    # empty split, and on a tiny corpus the key-hash val split can land empty
    # — failing after the train shards committed would leave a partial
    # dataset dir (train + card, no validation) with no cleanup. ONE
    # aggregation job over the iob table decides both (split membership is a
    # pure function of the key — augmentation never changes row counts);
    # with staging_dir this reads the snapshot, without it the upstream DAG
    # runs once for the probe instead of once per split.
    from otar3088_spark.operators.labelset import split_fraction_expr

    frac = split_fraction_expr(("conv_id", "turn_idx", "sent_idx"), seed=seed)
    counts = iob.select(
        F.count(F.lit(1)).alias("total"),
        F.coalesce(F.sum((frac < val_fraction).cast("long")), F.lit(0)).alias("n_val"),
    ).collect()[0]
    empty = [
        name
        for name, n in (
            ("train", counts["total"] - counts["n_val"]),
            ("validation", counts["n_val"]),
        )
        if n == 0
    ]
    if empty:
        raise ValueError(
            f"split(s) {empty} are empty at val_fraction={val_fraction} on "
            f"this corpus; nothing was written — adjust val_fraction or "
            f"supply more sentences"
        )
    train_shards = write_hf_dataset(
        encoded(train), out_dir, split="train", num_shards=num_shards
    )
    val_shards = write_hf_dataset(
        encoded(val), out_dir, split="validation", num_shards=num_shards
    )
    return {
        "label2id": label2id,
        "train_shards": train_shards,
        "val_shards": val_shards,
    }
