"""Large-scale deduplication operators (training-data pipeline battery).

All signatures are JVM-side: shingling via ``split``/``zip_with``/``slice``,
hashing via ``xxhash64(seed, shingle)``, min-hash via ``min`` aggregates,
banding via ``concat_ws`` + groupBy. No Python UDFs anywhere — at 100 TB the
cost is one scan + one groupBy per stage, and candidate verification only
touches bucket-collision pairs (LSH), never the quadratic cross product.

Operators:
* exact_dedup        — hash-groupBy on normalized text (first/min wins)
* shingles           — word n-gram shingling (expression helper)
* minhash_signatures — k independent min-hashes per doc (explode + groupBy
                       with k ``min(xxhash64(seed_i, sh))`` aggregates)
* lsh_candidate_pairs— band/bucket join → candidate pairs (dedup by bands)
* minhash_near_dups  — LSH candidates verified by exact Jaccard (inverted
                       index join, same shape as queries.q_ngram_jaccard_pairs)
* simhash            — 64-bit SimHash per doc via per-bit sign sums
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text_expr(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one representative (min id) per normalized-text hash.
    Returns (fingerprint, keep_id, group_size)."""
    fp = F.md5(normalized_text_expr(F.col(text_col)))
    return (
        docs.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("group_size"))
    )


def shingles_expr(text_col: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a text column (JVM array ops)."""
    toks = F.split(normalized_text_expr(text_col), " ")
    if k == 1:
        return F.array_distinct(toks)
    cols = [F.slice(toks, i + 1, F.greatest(F.size(toks) - k + 1, F.lit(0))) for i in range(k)]
    sh = cols[0]
    for c in cols[1:]:
        sh = F.zip_with(sh, c, lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the tail with nulls -> concat_ws drops them, producing
    # short shingles; a true k-shingle has exactly k-1 spaces.
    return F.array_distinct(
        F.filter(sh, lambda s: F.size(F.split(s, " ")) == k)
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, sig array) — k independent min-hashes per document.

    Explode distinct shingles once, then ONE groupBy computing k
    ``min(hash_i(shingle))`` aggregates — map-side partial aggregation keeps
    shuffle volume at k values per doc regardless of document size.

    ``hash_fn``: ``xxhash64`` (JVM-fast, the production path) or ``md5str``
    (min over ``md5(i || '|' || shingle)`` hex strings — lexicographic min of
    fixed-width hex equals numeric min, and DuckDB evaluates the identical
    expression, making the whole LSH pipeline oracle-checkable)."""
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_expr(F.col(text_col), shingle_k)).alias("sh")
    )
    if hash_fn == "md5str":
        hexpr = lambda i: F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))
    else:
        hexpr = lambda i: F.xxhash64(F.lit(i), F.col("sh"))
    aggs = [F.min(hexpr(i)).alias(f"h{i}") for i in range(num_hashes)]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def banded_signatures(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(id, band_idx, band_hash) — one row per (doc, band): the signature
    sliced into ``bands`` runs of ``rows_per_band`` values, each run packed
    into a single bucket-key string. Shared by the candidate join and the
    bucket-histogram diagnostics (tools/dedup_scale.py) so measurement can
    never drift from the production banding."""
    assert bands * rows_per_band <= 1 << 10
    return signatures.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[
                            F.col("sig")[b * rows_per_band + r].cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature, bucket-join on (band_idx, band_hash) -> candidate
    pairs (id1 < id2). Shuffle keys are band buckets — collisions only."""
    banded = banded_signatures(signatures, bands, rows_per_band)
    # SELF-join of the banded table: both sides are |docs| x bands rows, so
    # broadcasting either is categorically wrong beyond toy corpora — at 1M
    # docs the 8M-row build side OOMs the driver's broadcast build (measured,
    # round 6) while AQE's size estimate (compact shuffle bytes, not in-
    # memory HashedRelation) still says "broadcastable"; a shuffle-hash
    # build-side map OOMs tasks the same way one scale later. Pin SORT-MERGE:
    # spillable on both sides, co-partitioned on the bucket key, and the
    # join stays one exchange + sort at any corpus size — the only strategy
    # whose memory footprint is O(partition run), not O(partition).
    a, b = banded.alias("a"), banded.hint("merge").alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard for given candidate pairs via an inverted-index join."""
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_expr(F.col(text_col), shingle_k)).alias("sh")
    ).distinct()
    # per-doc set sizes straight from the doc row (array_distinct + size) —
    # computing them from `sh` would add a THIRD consumer of the exploded/
    # distinct subplan (s1 + s2 already consume it twice) and re-shingle
    # the corpus once more when ReuseExchange doesn't kick in
    sizes = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.array_distinct(shingles_expr(F.col(text_col), shingle_k))).alias("sz"),
    )
    s1 = sh.select(F.col("id").alias("id1"), F.col("sh"))
    s2 = sh.select(F.col("id").alias("id2"), F.col("sh"))
    # every sh-derived side scales with the corpus (|docs| x shingles-per-
    # doc rows): same sort-merge reasoning as the banded self-join above —
    # neither a broadcast build nor a per-task hash map may be corpus-sized.
    # The hint is load-bearing even though "obviously" s1 is huge: Catalyst's
    # STATIC size estimate descends from the source's sizeInBytes (a
    # spark.range generator reports 8 bytes/row; heavily-filtered parquet
    # lies the same way), so at 1M docs the planner happily chose
    # BuildRight(s1) and died building a 23M-row driver HashedRelation.
    inter = (
        pairs.join(s1.hint("merge"), "id1")
        .join(s2.hint("merge"), ["id2", "sh"])
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # the sizes table is ALSO corpus-sized (one row per doc) — same rule
    return (
        inter.join(
            sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1").hint("merge"),
            "id1",
        )
        .join(
            sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2").hint("merge"),
            "id2",
        )
        .select(
            "id1",
            "id2",
            (F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))).alias("jaccard"),
        )
    )


def minhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures → banded candidates →
    exact-Jaccard verification ≥ threshold. Returns (id1, id2, jaccard)."""
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k, hash_fn)
    cands = lsh_candidate_pairs(sig, bands, num_hashes // bands)
    return jaccard_pairs(docs, cands, id_col, text_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per doc: per-bit sign sum of token hashes, folded back into
    one long. Explode tokens → per-bit conditional-sum aggregates → bit fold.
    Returns (id, simhash long).

    ``hash_fn``: ``xxhash64`` (64-bit, production) or ``md5`` (60-bit — the
    first 15 md5 hex digits parsed as an integer, which DuckDB reproduces via
    ``('0x' || substr(md5(tok),1,15))::BIGINT`` — oracle-checkable)."""
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        n_bits = 60
    else:
        h = F.xxhash64(F.col("tok"))
        n_bits = 64
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalized_text_expr(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(n_bits)
    ]
    bits = toks.groupBy("id").agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in range(n_bits):
        acc = acc + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (1 << b) if b < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(0)
    return bits.select("id", acc.alias("simhash"))


def hamming_distance_expr(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))
