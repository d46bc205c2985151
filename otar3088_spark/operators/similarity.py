"""Similarity search over embedding columns — brute-force + LSH scale path.

* ``cosine_topk``      — exact brute-force top-k for a (small, broadcast)
  probe set: `zip_with` dot products, all JVM. The baseline; O(|probes|·|corpus|).
* ``rp_lsh_buckets``   — random-hyperplane LSH signatures, deterministically
  derived: hyperplane b's i-th component is ``sign(xxhash64(seed, b, i))``,
  so the "random" projection is a pure column expression (no driver-side
  matrix, stable across runs/partitions). sig bit b = sign(emb · h_b).
* ``ann_lsh_topk``     — the scale path: bucket-join probes to corpus rows
  sharing an LSH signature (optionally multi-probe over Hamming-1
  neighbors), exact-cosine verify within candidates, window top-k. At 100 TB
  the shuffle keys are the 2^bits buckets — candidates only, never the
  cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast probes against the corpus. Returns
    (q_id, vec_id, cos, rnk)."""
    p = F.broadcast(
        probes.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb"))
    )
    pairs = corpus.alias("x").join(p, F.col(f"x.{id_col}") != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        F.col(f"x.{id_col}").alias("vec_id"),
        cosine_expr(F.col(f"x.{vec_col}"), F.col("q_emb")).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cos"), F.col("rnk").cast("bigint").alias("rnk"))
    )


def _hyperplanes(bits: int, dim: int, seed: int):
    """Deterministic ±1 hyperplanes as plain Python lists (driver-side; the
    dictionary-of-hyperplanes is index metadata, like a broadcast dim)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return (rng.randint(0, 2, size=(bits, dim)) * 2 - 1).astype(float).tolist()


def rp_lsh_signature_expr(vec: Column, bits: int = 12, seed: int = 42, dim: int = 64) -> Column:
    """Integer LSH signature (random-hyperplane signs).

    Hyperplanes are embedded as LITERAL arrays so Catalyst constant-folds
    them — one zip_with+fold per bit per row, no per-row hyperplane
    regeneration (the naive transform(sequence(...), hash) variant allocated
    bits x dim expressions per row and was 5-10x slower)."""
    planes = _hyperplanes(bits, dim, seed)
    sig = F.lit(0).cast("int")
    for b in range(bits):
        h = F.array(*[F.lit(x) for x in planes[b]])
        proj = F.aggregate(
            F.zip_with(vec, h, lambda v, hv: v.cast("double") * hv),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def rp_lsh_buckets(
    df: DataFrame, bits: int = 12, seed: int = 42, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    return df.withColumn("lsh", rp_lsh_signature_expr(F.col(vec_col), bits, seed, dim))


def ann_lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    bits: int = 6,
    num_tables: int = 16,
    multiprobe: bool = True,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table LSH bucket join -> exact verify ->
    window top-k.

    ``num_tables`` independent signature tables (seed-offset hyperplane
    sets) union their candidate sets — the standard recall lever for
    random-hyperplane LSH; ``multiprobe`` additionally probes all Hamming-1
    neighbor buckets per table. Candidate volume ~ num_tables x bucket size
    x (1 + bits if multiprobe); never the cross product.
    Returns (q_id, vec_id, cos, rnk); approximate — rnk within candidates.
    """

    def keyed(df, ident, emb_alias):
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    rp_lsh_signature_expr(F.col(vec_col), bits, seed + 1000 * t, dim).alias("sig"),
                )
                for t in range(num_tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(ident),
            F.col(vec_col).alias(emb_alias),
            F.explode(tables).alias("ts"),
        ).select(ident, emb_alias, F.col("ts")["tbl"].alias("tbl"), F.col("ts")["sig"].alias("sig"))

    c = keyed(corpus, "vec_id", "c_emb")
    p = keyed(probes, "q_id", "q_emb")
    if multiprobe:
        flips = F.array(*[F.lit(0)] + [F.lit(1 << b) for b in range(bits)])
        p = p.select(
            "q_id",
            "q_emb",
            "tbl",
            F.explode(
                F.transform(flips, lambda m: F.col("sig").bitwiseXOR(m.cast("int")))
            ).alias("sig"),
        )
    cand = c.join(F.broadcast(p), ["tbl", "sig"]).filter(F.col("vec_id") != F.col("q_id"))
    scored = cand.select(
        "q_id",
        "vec_id",
        cosine_expr(F.col("c_emb"), F.col("q_emb")).alias("cos"),
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", F.round("cos", 6).alias("cos"), F.col("rnk").cast("bigint").alias("rnk"))
    )
