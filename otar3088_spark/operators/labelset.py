"""Label-set operators — rename/filter/encode/count/augment (F5, F6, P8, M3,
M5, M6, A4, A8).

Reference behaviors re-expressed as array/higher-order expressions:

* ``rename_labels``      — F5 label rename over IOB tags incl. B-/I- prefix
  strip/reapply (entity_processor.py:28-209, utils/common.py:209-242).
* ``filter_entity_labels`` — P8 keep-set filter on entity-struct arrays
  (entity_processor.py:86-101 ``filter_ent``).
* ``flatten_singleton_labels`` — F6 ``labels:[X] -> label:X``
  (entity_processor.py:11-24).
* ``count_labels``       — A4 label counters with and without IOB prefix
  (dataset_loader.py:76-115).
* ``encode_labels``      — M5 label2id map + int cast (dataset_loader.py:59-71).
* ``train_val_split``    — M6 seeded randomSplit (factory.py split_dataset).
* ``gazetteer_from_iob`` — M3/A8 entity-token-sequence gazetteer, deduped and
  capped per type (data_augmentation.py:66-116, cap 5000 at :23).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _map_lit(mapping: dict[str, str | int]):
    return F.create_map(*[x for k, v in mapping.items() for x in (F.lit(k), F.lit(v))])


def rename_labels(iob: DataFrame, mapping: dict[str, str], tags_col: str = "tags") -> DataFrame:
    """F5: rename entity types inside B-/I- tags; unmapped types pass through.
    'O' is never touched."""
    m = _map_lit(mapping)

    def fix(t):
        prefix = F.substring(t, 1, 2)
        base = F.regexp_replace(t, "^[BI]-", "")
        renamed = F.coalesce(m[base], base)
        # rewrite ONLY B-/I- tags: anything else ('O', IOBES 'E-'/'S-',
        # malformed tags) passes through untouched — concatenating a
        # 2-char prefix with an unstripped base silently corrupted them
        # ('E-Drug' -> 'E-E-Drug')
        return F.when(t.rlike("^[BI]-"), F.concat(prefix, renamed)).otherwise(t)

    return iob.withColumn(tags_col, F.transform(F.col(tags_col), fix))


def filter_entity_labels(
    spans: DataFrame, keep: list[str], label_col: str = "label"
) -> DataFrame:
    """P8: keep only spans whose label is in the configured set."""
    return spans.filter(F.col(label_col).isin(keep))


def flatten_singleton_labels(df: DataFrame, entities_col: str = "entities") -> DataFrame:
    """F6: entities array with ``labels: array<string>`` -> ``label: string``
    (first element), preserving the other struct fields start/end/text."""
    return df.withColumn(
        entities_col,
        F.transform(
            F.col(entities_col),
            lambda e: F.struct(
                e["start"].alias("start"),
                e["end"].alias("end"),
                e["text"].alias("text"),
                F.element_at(e["labels"], 1).alias("label"),
            ),
        ),
    )


def count_labels(iob: DataFrame, tags_col: str = "tags") -> DataFrame:
    """A4: (tag, n, base_label) counts — exploded tags grouped, with the
    prefix-stripped base alongside (two counters in one pass via rollup of
    the base column downstream if needed)."""
    ex = iob.select(F.explode(F.col(tags_col)).alias("tag"))
    return (
        ex.groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("base_label", F.regexp_replace("tag", "^[BI]-", ""))
    )


def encode_labels(
    iob: DataFrame, label2id: dict[str, int], tags_col: str = "tags"
) -> DataFrame:
    """M5: tags -> int64 ids; unknown tags -> -100 (ignore index)."""
    m = _map_lit(label2id)
    return iob.withColumn(
        f"{tags_col}_ids",
        F.transform(F.col(tags_col), lambda t: F.coalesce(m[t], F.lit(-100)).cast("long")),
    )


def split_fraction_expr(
    key_cols: tuple[str, ...], seed: int = 42, hash_family: str = "xxhash64"
):
    """The layout-stable split coordinate: a seeded hash of the key mapped
    into [0, 1). ``xxhash64`` is the production family (fastest, JVM-side);
    ``md5`` is the oracle twin — DuckDB computes the identical
    md5(seed|k1|k2|...) first-16-bits value, so split MEMBERSHIP is
    SQL-replayable row by row (same trick as the dedup md5 twins)."""
    if hash_family == "md5":
        h = F.md5(
            F.concat_ws(
                "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
            )
        )
        return F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") / 65536.0
    if hash_family != "xxhash64":
        raise ValueError(f"unknown hash_family: {hash_family!r}")
    return (
        F.pmod(
            F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols]),
            F.lit(1_000_000),
        )
        / 1_000_000.0
    )


def train_val_split(
    df: DataFrame,
    val_fraction: float = 0.2,
    seed: int = 42,
    key_cols: tuple[str, ...] | None = None,
    hash_family: str = "xxhash64",
):
    """M6: seeded split (reference: train_test_split seed=42).

    With ``key_cols`` the split is LAYOUT-STABLE: membership is a seeded
    hash threshold on the key (``split_fraction_expr``), so the same row
    lands in the same split whatever the partition count or cluster size —
    the only form that makes "deterministic re-runs" true across
    environments (randomSplit is only deterministic per partition layout).
    Without ``key_cols`` this falls back to randomSplit for keyless tables,
    with that documented caveat. Both forms split approximately (expected
    fraction, not exact counts)."""
    if key_cols:
        frac = split_fraction_expr(key_cols, seed=seed, hash_family=hash_family)
        return df.filter(frac >= val_fraction), df.filter(frac < val_fraction)
    train, val = df.randomSplit([1.0 - val_fraction, val_fraction], seed=seed)
    return train, val


def gazetteer_from_iob(
    iob: DataFrame, max_entities_per_type: int = 5000, seed: int = 42
) -> DataFrame:
    """M3+A8: collect distinct entity token-sequences per type from IOB data,
    shuffled deterministically and capped (data_augmentation.py:100-116).

    Returns (label, entities array<string>) — each entity a space-joined
    token sequence. The cap uses a seeded xxhash64 sort, not Python RNG, so
    it is stable across partitionings."""
    from otar3088_spark.operators.spans import iob_to_spans

    from pyspark.sql.window import Window

    spans = iob_to_spans(iob)
    dedup = spans.select("label", F.col("text").alias("entity")).distinct()
    ranked = dedup.withColumn("h", F.xxhash64(F.lit(seed), "entity"))
    # cap BEFORE the per-label array is materialized: a window row_number
    # bounds each task to the cap, whereas collect_list-then-slice
    # concentrated ALL distinct entities of a label (millions, model-IOB
    # corpora) into one task's array just to throw most of it away. Same
    # output: rows ranked by (h, entity), first max_entities_per_type kept,
    # array assembled from the already-capped set in the same order.
    w = Window.partitionBy("label").orderBy(F.col("h").asc(), F.col("entity").asc())
    capped = ranked.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_entities_per_type
    )
    return (
        capped.groupBy("label")
        .agg(F.sort_array(F.collect_list(F.struct("h", "entity"))).alias("z"))
        .select("label", F.transform("z", lambda s: s["entity"]).alias("entities"))
    )
