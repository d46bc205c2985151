"""Operator-parity query battery — SURVEY.md §2 inventory as runnable queries.

Each ``q_*`` function takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching entry in ``ORACLE_SQL`` is ANSI SQL DuckDB runs on the same parquet
(driver contract, ``__spark_entry__.py``). Conventions for hash-stable
comparison: every computed column is aliased identically on both sides,
floating aggregates are ``round(x, 4)``, timestamps are surfaced as strings.

The SURVEY.md §2 operator ids covered by each query are listed in its
docstring — this file is the line-by-line coverage evidence.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# committed parquet corpus shared by the kg_triples_gazetteer query and its
# DuckDB oracle (generated once by tools/make_kg_fixture.py)
KG_FIXTURE_DIR = Path(__file__).resolve().parents[1] / "fixtures" / "kg"

# --------------------------------------------------------------------------
# helpers


# Tables widened by default: the corpus tables, whose consumers run
# interpreted higher-order array kernels / Arrow batches where per-row cost
# dwarfs one bounded exchange. Other tables opt in per query via
# ``widen_key`` where the downstream shape was measured to benefit (heavy
# narrow work before the first exchange, or a reusable partitioning).
_WIDEN_KEYS = {"documents": "doc_id", "embeddings": "vec_id"}


def _t(
    spark: SparkSession, sf_dir: str, name: str, widen_key: str | None = None
) -> DataFrame:
    """Battery table loader with a scan-width guard (round 7).

    The driver's tables are SINGLE-ROW-GROUP parquet files (verified: every
    sf0.01/sf0.1 table, including 600k-row lineitem), and Spark assigns all
    row groups of a byte-range split to the one task holding the group's
    midpoint — so every scan stage here runs 1-2 tasks no matter the core
    count, and all narrow work above it (higher-order array kernels,
    shingling, partial aggregation) executes at parallelism 1-2 of 32
    (measured: term_tagging 3.7 -> 1.9 s, shingle arrays 1.9 -> 0.4 s at
    sf1.0 once widened). A hash repartition on a unique key to session
    parallelism unlocks the width for one bounded exchange of the table
    bytes.

    Default-on ONLY for the corpus tables (_WIDEN_KEYS); relational tables
    opt in per query via ``widen_key`` where measured to pay (json_props'
    parse, a window whose partitioning the repartition pre-establishes).
    Blanket relational widening was measured and REJECTED: scan + join/agg
    consumers lose more to the exchange than they save (semi_anti
    0.8 -> 7.0 s, broadcast_lookup 0.7 -> 6.0 s at sf1.0 when lineitem was
    widened round-robin — the retry-determinism local sort, SPARK-23207,
    runs inside the serial scan task).

    Scale-adaptive by input size, not a constant: widen only when the whole
    table is smaller than cores x maxPartitionBytes-ish (such inputs cannot
    reach full scan width naturally) and big enough (> ~100 KB) for the
    exchange to matter; cluster-scale inputs and tiny dims pass through
    untouched. Size comes from the filesystem (the driver contract is local
    parquet paths); unreadable/remote paths skip the guard."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    key = widen_key or _WIDEN_KEYS.get(name)
    if key is None:
        return df
    try:
        if os.path.isfile(path):
            nbytes = os.path.getsize(path)
        else:
            nbytes = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
    except OSError:
        return df
    cores = spark.sparkContext.defaultParallelism
    if 100_000 < nbytes < cores * 64 * 1024 * 1024:
        # hash repartition on a unique key, NOT round-robin: round-robin
        # local-sorts full rows for retry determinism (SPARK-23207) inside
        # the serial scan task, which is exactly the stage being relieved
        df = df.repartition(cores, F.col(key))
    return df


# Small inline dictionary over the documents vocabulary (single- and
# multi-token terms) used by the tagging-parity queries.
DOC_DICT = [
    ("T01", "table", "Obj"),
    ("T02", "spark", "Sys"),
    ("T03", "customer", "Obj"),
    ("T04", "hash value", "Expr"),
    ("T05", "sort key", "Expr"),
    ("T06", "group value", "Expr"),
    ("T07", "window table", "Expr"),
    ("T08", "stream", "Sys"),
]


# --------------------------------------------------------------------------
# Relational parity (S6 scan, P2-P5 filters, J1-J3/J7, A1-A9, W1-W5, U1-U3)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A6/A7 aggregate battery (TPC-H Q1 shape): scan+filter pushdown,
    partial aggregation, multi-agg groupBy. [S6, P5, A1, A6, A7]"""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k (TPC-H Q3 shape). [J2, A1, W4]"""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    # widen on the JOIN/GROUP key: the repartition replaces the join's own
    # lineitem exchange (same clustering), so the serial scan-stage decode
    # feeds a wide join + aggregation (interleaved A/B at sf1.0: 6.8 -> 4.2
    # s best, every sample pairwise faster)
    li = _t(spark, sf_dir, "lineitem", widen_key="l_orderkey")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_right_join_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right equi-join + groupBy dedup (cell_line_papers.py:17-40 shape). [J1, A5]"""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"], "right")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spent"),
        )
    )


def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way star join (trial_data_gather.py:36-60 shape); small dims broadcast
    automatically by Catalyst. [J2, A1, A7]"""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy("r_name")
    )


def q_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary lookup join — the reference's O(n*m) map_to_dictionary loop
    (chembl_sql_utils.py:25-40) as an explicit broadcast hash join. [J3]"""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti coverage audit (annotation_filtering.py:67-75).
    [J7, U2, U3]

    Stated as ONE pass: distinct lineitem part keys (partial-aggregated to
    ~|parts| rows before any exchange), one left join flagging coverage, one
    aggregation bucketing each part as with/without sales. The literal
    semi + anti pair built TWO broadcast hash tables over the full
    un-deduplicated l_partkey column (|lineitem| rows each) and scanned
    lineitem twice; the outputs are identical row sets (a part matches the
    semi join iff its key is in the distinct key set — null keys match
    neither side in both formulations)."""
    p = _t(spark, sf_dir, "part")
    li_keys = _t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    j = p.join(
        li_keys.withColumn("_m", F.lit(1)),
        p["p_partkey"] == li_keys["l_partkey"],
        "left",
    )
    return (
        j.groupBy(
            "p_type",
            F.when(F.col("_m").isNotNull(), F.lit("with_sales"))
            .otherwise(F.lit("without_sales"))
            .alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .select("p_type", "n_parts", "bucket")
    )


def q_filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate stack: not-null, !=, LIKE/ILIKE, isin, length (P2/P4/P5/P6)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey").isNotNull())
        .filter(F.col("o_orderstatus") != "F")
        .filter(F.col("o_orderpriority").like("%URGENT%") | F.col("o_orderpriority").isin("2-HIGH"))
        .filter(F.length("o_orderpriority") > 2)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def q_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup via row_number (drop_duplicates keep='first',
    extract_articles.py:176-181; DISTINCT ON, trial_data_gather.py:101-103).
    [P3, W3]"""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            "event_type",
        )
    )


def q_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE canonicalization kernel (A2, cellfinder_clean.ipynb cell 16) stated
    relationally: per p_brand the most frequent p_type, ties by name asc."""
    p = _t(spark, sf_dir, "part")
    counts = p.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("p_brand").orderBy(F.col("cnt").desc(), F.col("p_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_type").alias("mode_type"), "cnt")
        .orderBy("p_brand")
    )


def q_distinct_set_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups with >1 distinct member (sanity audit A3,
    cellfinder_clean.ipynb cell 18)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.countDistinct("p_type").alias("n_types"))
        .filter(F.col("n_types") > 1)
        .orderBy("p_brand")
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per customer (W1 top-/bottom-K pattern,
    chembl_sql_utils.py:66-85)."""
    # widen on the WINDOW key: the repartition pre-establishes the window's
    # clustering, so the decode leaves the serial scan task early and the
    # window adds no second exchange (measured 2.1 -> ~1.0 s at sf1.0)
    o = _t(spark, sf_dir, "orders", widen_key="o_custkey")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"), F.col("rnk").cast("bigint").alias("rnk"))
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 sequential look-ahead restated: lag + running-sum sessionization of
    events (gap > 30 min starts a session), the Spark shape of the
    reference's B-/I- span-merge walk (trial_to_papers.ipynb cell 11)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # ts is TIMESTAMP_NTZ: route through timestamp (session tz pinned UTC)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch, 1).over(w)
    e2 = e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    e3 = e2.withColumn("session_id", F.sum("new_sess").over(w))
    return (
        e3.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1-U3: union + intersect + except over event-type user sets
    (trial_to_papers.ipynb cells 17-18 set algebra)."""
    e = _t(spark, sf_dir, "events")
    clickers = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erroring = e.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = clickers.intersect(buyers).withColumn("cohort", F.lit("click_and_buy"))
    no_err = clickers.exceptAll(erroring).distinct().withColumn("cohort", F.lit("click_no_error"))
    return both.unionByName(no_err).groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users")).orderBy("cohort")


def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/F7 JSON field extraction (from_json vs literal_eval revival,
    utils/common.py:246-263)."""
    # widen: the per-row JSON parse is the query's entire cost and runs
    # before any exchange (measured 2.8 -> 0.8 s at sf1.0)
    e = _t(spark, sf_dir, "events", widen_key="event_id")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Text / KG operators over `documents` (the tagging/linking hot path)


_DOC_DICT_MEMO: dict[int, tuple[SparkSession, DataFrame]] = {}


def _doc_dict_df(spark: SparkSession) -> DataFrame:
    # one DataFrame OBJECT per session: DOC_DICT is a module constant, and a
    # stable object identity is what lets tagging's prepared-dim/anchor memo
    # hit across the battery's repeated invocations (tagging.py _ANCHOR_MEMO)
    hit = _DOC_DICT_MEMO.get(id(spark))
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = spark.createDataFrame(
        [(i, t, l) for (i, t, l) in DOC_DICT], ["ent_id", "term", "label"]
    ).withColumn("canonical_id", F.col("ent_id"))
    _DOC_DICT_MEMO[id(spark)] = (spark, df)
    while len(_DOC_DICT_MEMO) > 4:
        _DOC_DICT_MEMO.pop(next(iter(_DOC_DICT_MEMO)))
    return df


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + distinct tokens per doc (text-analysis op; F4/A4).
    Pure JVM: split + size + array_distinct."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 4).alias("ttr"),
    )


def _docs_as_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents reshaped as a single-sentence corpus — the ONE projection
    every tagging/IOB query keys on (doc_id<->conv_id casts round-trip
    exactly); shared so the oracle-gated consumers cannot diverge."""
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit(0).cast("int").alias("sent_idx"),
        F.col("text").alias("sent_text"),
    )


def _tag_documents(spark: SparkSession, sf_dir: str, **tag_kw) -> DataFrame:
    """Shared body of the two tagging queries: documents as single-sentence
    corpus through tag_mentions, projected to the oracle's column set.
    Both oracle-gated entries must stay byte-identical in shape — one body
    guarantees they can't diverge."""
    from otar3088_spark.operators.tagging import prepare_dictionary, tag_mentions

    d = _docs_as_sentences(spark, sf_dir)
    # whole documents as single sentences -> the per-sentence offsets-array
    # formulation (linear in doc length; the per-candidate fold is quadratic
    # on long docs and slower even at 54-token docs — BENCH/TAGGING_STRESS.md)
    spans = tag_mentions(
        d,
        prepare_dictionary(_doc_dict_df(spark)),
        precompute_offsets=True,
        **tag_kw,
    )
    return spans.select(
        F.col("conv_id").cast("bigint").alias("doc_id"),
        "start",
        "end",
        "term",
        "label",
        "ent_id",
    )


def q_term_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer tagging parity over documents (J4/J5 token-blocked broadcast
    join): every (doc, term, label, start-offset) dictionary hit. Exercises
    the exact engine code path used by the KG pipeline."""
    return _tag_documents(spark, sf_dir)


def q_term_tagging_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term_tagging through the bigram-anchor blocking key (the skewed-
    gazetteer escape hatch, BENCH/TAGGING_STRESS.md §2): n>=2 terms block on
    (first, second) allowed-pair keys instead of the first token alone.
    Same oracle as term_tagging — blocking only prefilters candidates, so
    the span set is identical by construction; this query pins that through
    the full DuckDB gate."""
    return _tag_documents(spark, sf_dir, bigram_anchor=True)


def q_mentions_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mention frequency rollup (A1 over tagging output): per (term,label)
    total hits + docs containing it."""
    spans = q_term_tagging(spark, sf_dir)
    return (
        spans.groupBy("term", "label")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("term", "label")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (text-analysis op): md5 over normalized text;
    prefix-fingerprint groups surface near-boilerplate docs."""
    d = _t(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.md5(F.substring(norm, 1, 30)).alias("prefix_fp"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy (dedup op #1): keep min doc_id per
    30-char-prefix fingerprint, count members."""
    fp = q_fingerprint(spark, sf_dir)
    return (
        fp.groupBy("prefix_fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("group_size"))
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring + n-gram language heuristic (text-analysis ops):
    stopword ratio, mean token length, lang guess. All JVM exprs."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_n = F.size(F.filter(toks, lambda t: t.isin("the", "a")))
    mean_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(stop_n / F.size(toks), 4).alias("stopword_ratio"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        F.when(stop_n > 0, F.lit("en_like")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by token-bigram Jaccard >= 0.5 (dedup op #4).
    Shuffle-safe shape: explode distinct shingles, self-join on shingle
    (inverted index), count intersections, join doc sizes. [dedup]

    Capped at doc_id < 500 (both here and in the oracle): the synthetic
    corpus has a ~30-word vocabulary, so bigram postings are degenerate and
    exact pairwise Jaccard is quadratic by construction. The SCALE path for
    near-dup detection is minhash_near_dups (LSH-bucketed, runs on the full
    corpus); this query exists to validate exact-Jaccard semantics."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    toks = F.split(F.col("text"), " ")
    bigrams = F.array_distinct(
        F.zip_with(toks, F.slice(toks, 2, F.size(toks)), lambda a, b: F.concat_ws(" ", a, b))
    )
    # zip_with pads the tail with null -> concat_ws yields a bare unigram;
    # a true bigram contains exactly one space, so keep only those.
    sh = d.select(F.col("doc_id"), F.explode(bigrams).alias("sh")).filter(
        F.col("sh").contains(" ")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("d1", "d2", "jaccard")
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for probe vectors (similarity-search
    baseline). Dot product via zip_with+aggregate — JVM-side, no UDF; probe
    side broadcast. [similarity]"""
    e = _t(spark, sf_dir, "embeddings")
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    # norms HOISTED to one column per side before the pair join — computed
    # |corpus| + |probes| times instead of per pair (the per-pair version
    # paid two extra 64-element folds on every one of the |corpus| x
    # |probes| rows; identical arithmetic per row, so identical cos values)
    probes = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        norm(F.col("embedding")).alias("q_norm"),
    )
    corpus = e.select(
        F.col("vec_id"), F.col("embedding"), norm(F.col("embedding")).alias("c_norm")
    )
    pairs = corpus.alias("x").join(F.broadcast(probes), F.col("x.vec_id") != F.col("q_id"))
    dot = F.aggregate(
        F.zip_with(F.col("x.embedding"), F.col("q_emb"), lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = pairs.select(
        "q_id",
        F.col("x.vec_id").alias("vec_id"),
        (dot / (F.col("x.c_norm") * F.col("q_norm"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "vec_id", F.round("cos", 4).alias("cos"), F.col("rnk").cast("bigint").alias("rnk"))
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, EXACT variant (dedup op #5): all
    pairs with cosine >= 0.45, hoisted norms, vec_id < 500 cap (same
    cap-and-document convention as ngram_jaccard_pairs — the scale path is
    the LSH-bucketed operators/similarity.py embedding_near_dups, whose
    recall is unit-tested against this exact set)."""
    from otar3088_spark.operators.similarity import _dot, _norm

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    c = e.select(
        F.col("vec_id"), F.col("embedding"), _norm(F.col("embedding")).alias("nrm")
    )
    a = c.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("e1"), F.col("nrm").alias("n1"))
    b = c.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("e2"), F.col("nrm").alias("n2"))
    pairs = a.join(b, F.col("id1") < F.col("id2"))
    cos = _dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2"))
    return (
        pairs.select("id1", "id2", cos.alias("c"))
        .filter(F.col("c") >= 0.45)
        .select("id1", "id2", F.round("c", 4).alias("cos"))
    )


def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC over a chain graph (P5 canonicalization primitive): edges link
    consecutive doc_ids sharing a lang; component = min reachable doc_id.
    Exercises the engine's iterative min-label propagation."""
    from otar3088_spark.operators.canonicalize import connected_components

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    a, b = d.alias("a"), d.alias("b")
    # node ids stay NUMERIC: component = min reachable doc_id must be the
    # numeric min to match the oracle's min(comp) over bigints — string ids
    # would make min lexicographic ("10" < "8") and diverge on any same-lang
    # chain crossing a power-of-ten boundary (latent until the data has one;
    # the operator itself is key-type generic)
    edges = a.join(
        b,
        (F.col("b.doc_id") == F.col("a.doc_id") + 1) & (F.col("a.lang") == F.col("b.lang")),
    ).select(
        F.col("a.doc_id").cast("bigint").alias("src"),
        F.col("b.doc_id").cast("bigint").alias("dst"),
    )
    # force the distributed iterative path (small_graph_threshold=0) — this
    # query exists to verify min-label propagation + pointer jumping against
    # the DuckDB recursive-CTE oracle; the driver-side union-find fast path
    # is covered by the KG pipeline's dictionary clusters.
    comps = connected_components(edges, max_iter=50, small_graph_threshold=0)
    return comps.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
    )


# --------------------------------------------------------------------------
# Rows-only: only the xxhash64-hash-family twins (their md5 twins below are
# fully oracle-checked) and the fixture-input kg_triples flagship. Everything
# else here gained real DuckDB oracles: iob_roundtrip (derived from the
# tagging CTE), model_mentions/seq_classify (md5 stand-ins), ann_lsh_topk
# (literal hyperplane arrays + list_inner_product).


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate detection over documents (dedup op #2);
    xxhash64 signatures are not reproducible in DuckDB -> rows-only check,
    but the pipeline is TWIN-EQUIVALENT to the fully-oracle-checked md5
    variant: tests/test_operators.py::test_hash_family_equivalence_of_dedup_twins
    asserts both hash families produce the identical verified pair set."""
    from otar3088_spark.operators.dedup import minhash_near_dups

    d = _t(spark, sf_dir, "documents")
    return minhash_near_dups(
        d, num_hashes=32, bands=8, shingle_k=2, threshold=0.5
    ).orderBy("id1", "id2")


def q_minhash_near_dups_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dups with the md5-string hash family — IDENTICAL
    pipeline shape to minhash_near_dups (signatures → banded candidates →
    exact-Jaccard verify) but with a hash DuckDB can replay, so the full LSH
    dedup path is oracle-checked, not rows-only."""
    from otar3088_spark.operators.dedup import minhash_near_dups

    d = _t(spark, sf_dir, "documents")
    return (
        minhash_near_dups(
            d, num_hashes=32, bands=8, shingle_k=2, threshold=0.5, hash_fn="md5str"
        )
        .select("id1", "id2", F.round("jaccard", 4).alias("jaccard"))
        .orderBy("id1", "id2")
    )


def q_simhash_buckets_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints with the 60-bit md5-derived hash — same per-bit
    sign-sum fold as the xxhash64 path, oracle-checked in DuckDB."""
    from otar3088_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents")
    sh = simhash(d, hash_fn="md5")
    return sh.select(
        F.col("id").alias("doc_id"),
        F.col("simhash"),
        F.shiftrightunsigned(F.col("simhash"), 52).alias("bucket"),
    )


def q_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + 8-bit prefix buckets (dedup op #3). xxhash64
    is not reproducible in DuckDB -> rows-only check, but twin-equivalent to
    the oracle-checked md5 variant (same equal-text collisions and group
    structure — test_hash_family_equivalence_of_dedup_twins)."""
    from otar3088_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents")
    sh = simhash(d)
    return sh.select(
        F.col("id").alias("doc_id"),
        F.col("simhash"),
        F.shiftrightunsigned(F.col("simhash"), 56).alias("bucket"),
    )


def q_model_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stand-in transformer inference via mapInPandas (M1) over
    documents-as-sentences; per-executor model singleton, Arrow batches."""
    from otar3088_spark.operators.inference import model_mentions

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit(0).cast("int").alias("sent_idx"),
        F.col("text").alias("sent_text"),
    )
    return model_mentions(d).select(
        F.col("conv_id").cast("bigint").alias("doc_id"),
        "start", "end", "surface", "label", "score",
    )


def q_seq_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 sequence classification over documents-as-sentences (mapInPandas,
    deterministic md5 stand-in — DuckDB replays the same md5 family)."""
    from otar3088_spark.operators.inference import model_classify

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit(0).cast("int").alias("sent_idx"),
        F.col("text").alias("sent_text"),
    )
    return model_classify(d).select(
        F.col("conv_id").cast("bigint").alias("doc_id"), "cls", "score"
    )


def _tag_documents_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents-as-sentences through the GROUPED tagging path (one row per
    matched sentence, spans still in their per-sentence array): the shared
    front end of the two IOB consumers. Output-equivalent to feeding
    ``spans_to_iob(d, q_term_tagging(...))``: the span-array content is
    identical (same kernel, explode elided), and every sentence absent here
    is an all-O row both consumers drop (iob_to_spans emits no rows
    without a B- tag; filter_all_o filters them; anchored sentences whose
    candidates all fail validation are PRESENT with an empty array and
    drop the same way) — so eliding the explode +
    re-collect_list + sentence re-join changes no query result (oracle-
    gated; fusion-equivalence also pinned by
    ``test_grouped_iob_fusion_matches_unfused``)."""
    from otar3088_spark.operators.tagging import prepare_dictionary, tag_mentions_grouped

    return tag_mentions_grouped(
        _docs_as_sentences(spark, sf_dir), prepare_dictionary(_doc_dict_df(spark))
    )


def q_iob_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span->IOB->span round-trip over tagged documents (J9/F12 + W5 merge):
    returns merged spans re-derived from IOB tags."""
    from otar3088_spark.operators.spans import grouped_spans_to_iob, iob_to_spans

    iob = grouped_spans_to_iob(_tag_documents_grouped(spark, sf_dir))
    return iob_to_spans(iob).select(
        F.col("conv_id").cast("bigint").alias("doc_id"),
        "start_pos", "end_pos", "text", "label",
    )


def q_ner_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data assembly (T1 data side, plans/training_data):
    spans -> IOB -> drop all-O -> encode labels -> layout-stable key-hash
    split, emitted as (split, doc_id, toks_md5, tags_md5) so DuckDB replays
    tagging + tag assignment + encoding + SPLIT MEMBERSHIP row by row. Uses
    the md5 split family (oracle twin); production uses xxhash64 — family
    equivalence is pytest-pinned (test_training_data.py). Reference lineage:
    dataset_loader.py:352-446."""
    from otar3088_spark.operators.labelset import encode_labels, split_fraction_expr
    from otar3088_spark.operators.spans import filter_all_o, grouped_spans_to_iob
    from otar3088_spark.plans.training_data import label_map

    iob = filter_all_o(grouped_spans_to_iob(_tag_documents_grouped(spark, sf_dir)))
    label2id = label_map(sorted({l for (_, _, l) in DOC_DICT}))
    enc = encode_labels(iob, label2id)
    frac = split_fraction_expr(
        ("conv_id", "turn_idx", "sent_idx"), seed=42, hash_family="md5"
    )
    return enc.select(
        F.when(frac < 0.25, F.lit("validation")).otherwise(F.lit("train")).alias("split"),
        F.col("conv_id").cast("bigint").alias("doc_id"),
        F.md5(F.concat_ws(" ", "tokens")).alias("toks_md5"),
        F.md5(
            F.concat_ws(",", F.transform("tags_ids", lambda t: t.cast("string")))
        ).alias("tags_md5"),
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors (similarity scale path):
    multi-table random-hyperplane signatures + Hamming-1 multiprobe +
    exact-cosine verify. Fully oracle-checked: the seeded hyperplane matrix
    is embedded in the DuckDB SQL as literal arrays (list_inner_product sign
    bits), so DuckDB replays the identical index + probe + verify pipeline.
    Recall vs brute force additionally pytest-verified."""
    from otar3088_spark.operators.similarity import ann_lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 10)
    return ann_lsh_topk(e, probes, k=5)


_KG_FIXTURE_MEMO: dict[int, tuple[SparkSession, DataFrame, DataFrame]] = {}


def _kg_fixture(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """One (transcripts, dictionary) DataFrame pair per session for the two
    fixture-corpus flagship queries. A fresh ``spark.read.parquet`` per
    invocation is a NEW DataFrame object, which misses every
    identity-keyed plan memo downstream (prepare_dictionary,
    tag_mentions' anchor dim) — so each bench repetition re-ran the
    plan-time dictionary-stats + anchor-collect jobs. Same lifetime/
    staleness contract as _DOC_DICT_MEMO / the tagging memos (a re-read of
    changed source data is a new session or new object -> miss).

    Deliberately NOT extended to the built QUERY plans: memoizing a plan
    that contains ``persist_spans=True`` would let bench repetitions 2..N
    read rep 1's persisted span cache instead of recomputing the pipeline
    (measured: the fixture queries drop to ~0.5-0.8 s/rep, cache-read
    level) — result caching, not plan reuse. Each call builds a fresh
    plan; only the fixture scans and the identity-keyed dim memos are
    shared."""
    hit = _KG_FIXTURE_MEMO.get(id(spark))
    if hit is not None and hit[0] is spark:
        _KG_FIXTURE_MEMO[id(spark)] = _KG_FIXTURE_MEMO.pop(id(spark))
        return hit[1], hit[2]
    t = spark.read.parquet(str(KG_FIXTURE_DIR / "transcripts.parquet"))
    d = spark.read.parquet(str(KG_FIXTURE_DIR / "dictionary.parquet"))
    _KG_FIXTURE_MEMO[id(spark)] = (spark, t, d)
    while len(_KG_FIXTURE_MEMO) > 4:
        _KG_FIXTURE_MEMO.pop(next(iter(_KG_FIXTURE_MEMO)))
    return t, d


def q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship KG pipeline — the MERGED path: gazetteer + transformer-scored
    spans (deterministic md5 stand-in scorer) entity-linked through the
    exploded-key broadcast equi-join and unioned with dictionary precedence.
    Runs over the committed fixture corpus (fixtures/kg/) so the ENTIRE
    merged pipeline — model scoring included — is DuckDB-oracle-checked
    (oracles_sql kg_triples replays the md5 stand-in + linker + merge in
    SQL); the pytest golden differential covers it a second way."""
    from otar3088_spark.plans.kg_pipeline import build_kg

    transcripts, dictionary = _kg_fixture(spark)
    # persist_spans=True: spans feed both label resolution passes — without
    # the persist the model+tagging subtree executes twice (r2 judge finding)
    return build_kg(transcripts, dictionary, persist_spans=True, use_model=True).triples


def q_kg_triples_gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully-oracle-checked twin of the flagship: the gazetteer KG path
    (normalize -> sentencize -> tag -> resolve -> cluster -> triples) over
    the COMMITTED fixture corpus (fixtures/kg/*.parquet — includes
    irregular-plural turns that link only through the default
    IRREGULAR_PLURALS lemma table). The DuckDB oracle replays the identical
    pipeline as one CTE chain over the same parquet files, so the flagship's
    every deterministic stage is hash-checked end to end (the merged model
    path keeps its pytest golden-parity coverage on top)."""
    from otar3088_spark.plans.kg_pipeline import build_kg

    transcripts, dictionary = _kg_fixture(spark)
    return build_kg(transcripts, dictionary, persist_spans=True).triples


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "right_join_dedup": q_right_join_dedup,
    "multiway_join": q_multiway_join,
    "broadcast_lookup": q_broadcast_lookup,
    "semi_anti": q_semi_anti,
    "filter_battery": q_filter_battery,
    "dedup_first_wins": q_dedup_first_wins,
    "mode_priority": q_mode_priority,
    "distinct_set_audit": q_distinct_set_audit,
    "topk_per_group": q_topk_per_group,
    "sessionize": q_sessionize,
    "set_ops": q_set_ops,
    "json_props": q_json_props,
    "token_stats": q_token_stats,
    "term_tagging": q_term_tagging,
    "term_tagging_bigram": q_term_tagging_bigram,
    "mentions_rollup": q_mentions_rollup,
    "fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "quality_score": q_quality_score,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "connected_components": q_connected_components,
    # xxhash64-based: rows-only (no SQL oracle; pytest differential coverage)
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_buckets": q_simhash_buckets,
    # md5-hash-family twins of the above: fully DuckDB-oracle-checked
    "minhash_near_dups_md5": q_minhash_near_dups_md5,
    "simhash_buckets_md5": q_simhash_buckets_md5,
    "model_mentions": q_model_mentions,
    "seq_classify": q_seq_classify,
    "iob_roundtrip": q_iob_roundtrip,
    "ner_dataset": q_ner_dataset,
    "ann_lsh_topk": q_ann_lsh_topk,
    "kg_triples": q_kg_triples,
    "kg_triples_gazetteer": q_kg_triples_gazetteer,
}
