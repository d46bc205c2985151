"""Training-dataset assembly plan (plans/training_data.py): spans -> IOB ->
encoded, split, sharded HF dataset — the data side of the reference's NER
training stack (dataset_loader.py), trainer itself out of scope."""

from __future__ import annotations

from pyspark.sql import functions as F

from otar3088_spark.operators.sentencize import normalize_turns, sentencize
from otar3088_spark.operators.tagging import prepare_dictionary, tag_mentions
from otar3088_spark.plans.training_data import build_ner_dataset, label_map
from otar3088_spark.sources.hf_dataset import read_hf_dataset


def test_label_map_hf_convention():
    m = label_map(["Gene", "Anatomy"])
    assert m == {"O": 0, "B-Anatomy": 1, "I-Anatomy": 2, "B-Gene": 3, "I-Gene": 4}


def test_build_ner_dataset_roundtrip(spark, transcripts_df, dictionary_df, tmp_path):
    sents = sentencize(normalize_turns(transcripts_df))
    spans = tag_mentions(sents, prepare_dictionary(dictionary_df))
    out = tmp_path / "ner_ds"

    manifest = build_ner_dataset(sents, spans, str(out), seed=42)
    label2id = manifest["label2id"]
    assert label2id["O"] == 0 and len(label2id) >= 3
    assert manifest["train_shards"] and manifest["val_shards"]

    train = read_hf_dataset(spark, str(out), "train")
    val = read_hf_dataset(spark, str(out), "validation")
    assert set(train.columns) == {"conv_id", "turn_idx", "sent_idx", "tokens", "ner_tags"}

    # every row aligned (|tokens| == |ner_tags|), every id in-vocabulary
    # (labels were derived, so -100 must never appear), every sentence
    # annotated (all-O dropped), and at least one B- tag present
    for split in (train, val):
        assert split.filter(F.size("tokens") != F.size("ner_tags")).count() == 0
        assert split.filter(
            F.exists("ner_tags", lambda t: (t < 0) | (t >= len(label2id)))
        ).count() == 0
        assert split.filter(F.forall("ner_tags", lambda t: t == 0)).count() == 0
    b_ids = {v for k, v in label2id.items() if k.startswith("B-")}
    seen_ids = {
        r["i"]
        for r in train.unionByName(val)
        .select(F.explode("ner_tags").alias("i"))
        .distinct()
        .collect()
    }
    assert seen_ids & b_ids, "at least one B- tag must survive encoding"

    # ids decode back to the exact IOB tags of a direct spans_to_iob pass
    from otar3088_spark.operators.labelset import encode_labels
    from otar3088_spark.operators.spans import filter_all_o, spans_to_iob

    direct = encode_labels(filter_all_o(spans_to_iob(sents, spans)), label2id)
    whole = direct.select("conv_id", "turn_idx", "sent_idx",
                          F.col("tags_ids").alias("want"))
    both = train.unionByName(val).join(whole, ["conv_id", "turn_idx", "sent_idx"])
    assert both.count() == direct.count()  # split is a partition of the whole
    assert both.filter(F.col("ner_tags") != F.col("want")).count() == 0

    # deterministic: same seed -> identical split membership; this build
    # also exercises the staging snapshot (tagging DAG executes once)
    out2 = tmp_path / "ner_ds2"
    build_ner_dataset(
        sents, spans, str(out2), seed=42, staging_dir=str(tmp_path / "stage")
    )
    t2 = read_hf_dataset(spark, str(out2), "train")
    key = ["conv_id", "turn_idx", "sent_idx"]
    assert train.select(*key).exceptAll(t2.select(*key)).count() == 0
    assert t2.select(*key).exceptAll(train.select(*key)).count() == 0


def test_build_ner_dataset_with_augmentation(
    spark, transcripts_df, dictionary_df, tmp_path
):
    """The M4 augmentation hook: train-split sentences get same-type entity
    substitutions; alignment and vocabulary invariants must survive."""
    from otar3088_spark.operators.labelset import gazetteer_from_iob
    from otar3088_spark.operators.spans import spans_to_iob

    sents = sentencize(normalize_turns(transcripts_df))
    spans = tag_mentions(sents, prepare_dictionary(dictionary_df))
    gaz = gazetteer_from_iob(spans_to_iob(sents, spans))
    out = tmp_path / "ner_ds_aug"

    manifest = build_ner_dataset(
        sents, spans, str(out), gazetteer=gaz, p_swap=0.5, seed=42
    )
    train = read_hf_dataset(spark, str(out), "train")
    assert train.filter(F.size("tokens") != F.size("ner_tags")).count() == 0
    assert train.filter(
        F.exists("ner_tags", lambda t: (t < 0) | (t >= len(manifest["label2id"])))
    ).count() == 0
    # validation is NEVER augmented: identical to the unaugmented build
    plain = tmp_path / "ner_ds_plain"
    build_ner_dataset(sents, spans, str(plain), seed=42)
    v1 = read_hf_dataset(spark, str(out), "validation").sort("conv_id", "turn_idx", "sent_idx")
    v2 = read_hf_dataset(spark, str(plain), "validation").sort("conv_id", "turn_idx", "sent_idx")
    assert v1.exceptAll(v2).count() == 0 and v2.exceptAll(v1).count() == 0


def test_split_hash_family_equivalence(spark):
    """The md5 split family (the ner_dataset oracle twin) and the xxhash64
    production family are interchangeable: both are seeded deterministic
    partitions of the input, layout-stable under repartitioning, and land
    near the requested fraction. (Per-row membership differs by design —
    they are different hash functions; what must agree is the CONTRACT.)"""
    from otar3088_spark.operators.labelset import train_val_split

    df = spark.range(2000).select(
        F.col("id").cast("string").alias("conv_id"),
        (F.col("id") % 7).cast("int").alias("turn_idx"),
        (F.col("id") % 3).cast("int").alias("sent_idx"),
    )
    key = ["conv_id", "turn_idx", "sent_idx"]
    for fam in ("xxhash64", "md5"):
        tr, va = train_val_split(
            df, val_fraction=0.25, seed=42, key_cols=tuple(key), hash_family=fam
        )
        n_tr, n_va = tr.count(), va.count()
        # exact partition: disjoint and exhaustive
        assert n_tr + n_va == 2000
        assert tr.select(*key).intersect(va.select(*key)).count() == 0
        # near the requested fraction (binomial tolerance)
        assert 0.18 < n_va / 2000 < 0.32, (fam, n_va)
        # layout-stable: same membership at a different partitioning
        tr2, _ = train_val_split(
            df.repartition(7), val_fraction=0.25, seed=42,
            key_cols=tuple(key), hash_family=fam,
        )
        assert tr2.select(*key).exceptAll(tr.select(*key)).count() == 0
        # seed-sensitive: a different seed moves some rows
        tr3, _ = train_val_split(
            df, val_fraction=0.25, seed=7, key_cols=tuple(key), hash_family=fam
        )
        assert tr3.select(*key).exceptAll(tr.select(*key)).count() > 0
