"""Gazetteer-substitution augmentation — M4 (data_augmentation.py:118-181).

The reference walks each training sentence and, with probability ~0.3-0.4,
swaps one entity for a random same-type gazetteer entry, rebuilding the IOB
tags (seeded RNG, skip if the result exceeds a length cap). Spark-first
restatement, fully JVM-side:

* the gazetteer (label -> entity token-seqs, already deduped+capped by
  ``labelset.gazetteer_from_iob``) joins in broadcast;
* the "random" draws are ``xxhash64`` of the sentence key + seed — stable
  under repartitioning and re-runs, unlike ``rand()`` whose values depend on
  partition layout (SURVEY §4 deterministic-seeding row);
* token/tag arrays are rebuilt with slice/concat expressions.

Training-side only; not part of the parity-graded hot path (SURVEY §2.8) but
completes the M-operator inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def augment_with_gazetteer(
    iob: DataFrame,
    gazetteer: DataFrame,
    p_swap: float = 0.3,
    seed: int = 42,
    max_tokens: int = 512,
) -> DataFrame:
    """Return ``iob`` with a deterministic fraction of sentences augmented.

    Input grain: (conv_id, turn_idx, sent_idx, tokens, tags);
    ``gazetteer``: (label, entities array<string>) — each entity a
    space-joined token sequence. The FIRST entity span of a selected sentence
    is replaced by a hash-picked same-type gazetteer entry. Output adds
    ``augmented`` bool.
    """
    key_hash = F.xxhash64(F.lit(seed), "conv_id", "turn_idx", "sent_idx")
    selected = (F.pmod(key_hash, F.lit(1_000_000)) / 1_000_000.0) < p_swap

    # first B- span: position + its label + span length (B + following I-).
    # greatest(..., 0) guards empty tag arrays: sequence(0, -1) is a
    # DESCENDING [0, -1] whose element access raises INVALID_INDEX_OF_ZERO
    # (the hazard iob_to_spans documents); with the clamp an empty row
    # yields [0] -> NULL lookup -> no B- found -> clean unaugmented
    # passthrough.
    tags = F.col("tags")
    idxs = F.sequence(F.lit(0), F.greatest(F.size(tags) - 1, F.lit(0)))
    b_positions = F.filter(
        idxs, lambda i: F.try_element_at(tags, i + 1).startswith("B-")
    )
    b_pos = F.try_element_at(b_positions, F.lit(1))  # 0-based or NULL
    label = F.regexp_replace(F.try_element_at(tags, b_pos + 1), "^B-", "")
    # span length: 1 + count of consecutive I-<label> after b_pos
    after = F.slice(tags, b_pos + 2, F.size(tags))
    not_i = F.filter(
        F.sequence(F.lit(0), F.greatest(F.size(after) - 1, F.lit(0))),
        lambda i: ~F.coalesce(
            F.try_element_at(after, i + 1).startswith(F.concat(F.lit("I-"), label)),
            F.lit(False),
        ),
    )
    span_len = F.lit(1) + F.coalesce(F.try_element_at(not_i, F.lit(1)), F.size(after))

    g = F.broadcast(gazetteer.select(F.col("label").alias("g_label"), "entities"))
    df = iob.withColumn("_label", label).join(
        g, F.col("_label") == F.col("g_label"), "left"
    )

    pick = F.try_element_at(
        F.col("entities"),
        (F.pmod(F.xxhash64(F.lit(seed + 1), "conv_id", "turn_idx", "sent_idx"), F.size("entities")) + 1).cast("int"),
    )
    new_toks_ent = F.split(pick, " ")
    new_tags_ent = F.concat(
        F.array(F.concat(F.lit("B-"), F.col("_label"))),
        F.transform(
            F.slice(new_toks_ent, 2, F.size(new_toks_ent)),
            lambda _: F.concat(F.lit("I-"), F.col("_label")),
        ),
    )
    rebuilt_toks = F.concat(
        F.slice(F.col("tokens"), 1, b_pos),
        new_toks_ent,
        F.slice(F.col("tokens"), b_pos + span_len + 1, F.size(F.col("tokens"))),
    )
    rebuilt_tags = F.concat(
        F.slice(tags, 1, b_pos),
        new_tags_ent,
        F.slice(tags, b_pos + span_len + 1, F.size(tags)),
    )

    do_swap = (
        selected
        & b_pos.isNotNull()
        & pick.isNotNull()
        & (F.size(rebuilt_toks) <= max_tokens)
    )
    return (
        df.withColumn("augmented", F.coalesce(do_swap, F.lit(False)))
        .withColumn(
            "tokens", F.when(F.col("augmented"), rebuilt_toks).otherwise(F.col("tokens"))
        )
        .withColumn(
            "tags", F.when(F.col("augmented"), rebuilt_tags).otherwise(F.col("tags"))
        )
        .drop("_label", "g_label", "entities")
    )
