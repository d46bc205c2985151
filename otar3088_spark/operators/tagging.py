"""Gazetteer mention detection — stage P2: the token-blocked broadcast join.

The reference implements dictionary tagging three ways: an in-process lemma
hash-map with a sliding n-gram window (labelstudio_e2e.py:196-240), a spaCy
PhraseMatcher over ``nlp.pipe`` batches (COVID_ner_clean.ipynb cell 7), and a
per-term boundary regex ``(?<!\\w)term(?:s|'s)?(?!\\w)`` (labelstudio_e2e.py:
171-178). All three are per-row Python. Here the same semantics are ONE
declarative join:

  1. tokenize each sentence by space on cleaned text; compute char offsets
     with an ``aggregate`` cumulative scan (per-row JVM, no shuffle);
  2. explode tokens as anchor candidates ``(anchor_key, variant)`` where the
     plural/possessive destem variant implements the boundary-regex suffix;
  3. broadcast-join against the dictionary blocked on the term's FIRST token
     (the 'token-blocked' key — blocks candidate pairs to ~|dict-first-token|
     matches per token instead of |dict| regex scans per sentence);
  4. validate the full n-token window with ``slice`` equality — still pure
     Catalyst expressions;
  5. longest-match containment dedup via a per-sentence array filter (one
     groupBy, no recomputation of the upstream DAG).

Zero Python anywhere; the dictionary side is explicitly ``F.broadcast`` so
skewed head entities ("HeLa"-type, cell_line_papers.py:56) never shuffle.
At 100 TB the cost is one narrow pass over sentences + an explode whose
output is pruned immediately by the broadcast hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otar3088_spark.functions.text import (
    destem_expr,
    offsets_expr,
    token_core_expr,
    token_lead_expr,
)

# P7 red-list: Anatomy terms with these suffixes are dictionary noise
# (cellfinder_clean.ipynb cell 8).
REDLIST_SUFFIX = r"(?:genesis|cytic|ial|yal)$"


def prepare_dictionary(dict_df: DataFrame) -> DataFrame:
    """Normalize the gazetteer for matching.

    Applies the reference's dictionary hygiene: term length > 2
    (labelstudio_e2e.py:164-166, P6), Anatomy red-list suffix drop
    (cellfinder_clean.ipynb cell 8, P7), lowercase matching keys
    (PhraseMatcher attr="LOWER"). Output columns:
    ``ent_id, label, term, term_tokens(array<string>), n(int), first(string)``.
    """
    d = dict_df.filter(F.length("term") > 2).filter(
        ~((F.col("label") == "Anatomy") & F.lower(F.col("term")).rlike(REDLIST_SUFFIX))
    )
    d = d.withColumn("term_tokens", F.split(F.lower(F.trim(F.col("term"))), r"\s+"))
    return (
        d.withColumn("n", F.size("term_tokens").cast("int"))
        .withColumn("first_tok", F.element_at("term_tokens", 1))
        .dropDuplicates(["ent_id", "label", "term_tokens"])
        .select("ent_id", "label", "term", "term_tokens", "n", "first_tok")
    )


def tokenize_sentences(sentences: DataFrame) -> DataFrame:
    """Attach token arrays + offset arrays to sentence rows (all per-row JVM).

    Columns added: ``toks`` raw tokens, ``starts`` char offsets of each raw
    token, ``cores`` punctuation-stripped tokens, ``leads`` leading-strip
    widths, ``keys`` lowercase match keys, ``keys_ds`` destemmed keys (NULL
    where no plural/possessive suffix applies).

    Used by IOB conversion (spans_to_iob); the tagging hot path below builds
    leaner per-token projections instead (allocation-bandwidth matters there).
    """
    df = sentences.withColumn("toks", F.split(F.col("sent_text"), " "))
    df = df.withColumn("starts", offsets_expr(F.col("toks")))
    df = df.withColumn("cores", F.transform(F.col("toks"), token_core_expr))
    df = df.withColumn("leads", F.transform(F.col("toks"), token_lead_expr))
    df = df.withColumn("keys", F.transform(F.col("cores"), F.lower))
    return df.withColumn("keys_ds", F.transform(F.col("keys"), destem_expr))


def tag_mentions(
    sentences: DataFrame,
    dictionary: DataFrame,
    max_prefilter_terms: int = 50_000,
    lemma_overrides: dict[str, str] | None = None,
) -> DataFrame:
    """Detect dictionary mentions in sentences; returns one row per span.

    Output: ``conv_id, turn_idx, sent_idx, start, end, surface, term, label,
    ent_id`` with char offsets into ``sent_text`` satisfying the invariant
    ``substring(sent_text, start+1, end-start) == surface``
    (article_normaliser.py:285-324 alignment check, enforced downstream).
    """
    # --- plan-time dictionary stats -----------------------------------------
    # The dictionary is a broadcast dim by design, so collecting its distinct
    # first tokens (anchor IN-set) at plan time is legitimate driver work —
    # but only up to a point: a multi-million-term gazetteer would bloat the
    # plan with a giant IN-list literal. Above ``max_prefilter_terms``
    # distinct first/last tokens the pre-filter is skipped automatically (the
    # broadcast hash join below prunes non-anchors just as correctly, one
    # narrow stage later). The count is a cheap agg over the broadcast dim.
    # ONE bounded job decides and fetches: limit(max+1) caps driver memory,
    # and an over-limit result means "skip the prefilter".
    firsts: list[str] | None = sorted(
        r["first_tok"]
        for r in dictionary.select("first_tok")
        .distinct()
        .limit(max_prefilter_terms + 1)
        .collect()
    )
    if len(firsts) > max_prefilter_terms:
        firsts = None

    # --- dictionary-side irregular-plural expansion --------------------------
    # The F8 override map is applied to the DIM side, never per corpus
    # token: for every dictionary term whose LAST token (== only token when
    # n==1) is the lemma of an irregular plural, a variant row with the
    # plural substituted is unioned in, marked ``_exp = 1``. The per-token
    # hot path keeps the EXACT destem-only expression shape — measured:
    # even a one-entry override CASE wrapped around destem in the fused
    # normalize→sentencize→tag stage cost 15-40% of the whole pipeline at 8
    # cores (conditional branches are excluded from codegen subexpression
    # elimination, so every extra WHEN level re-evaluates the regex-derived
    # key), while the dim-side union is O(|dict|) plan-time work.
    #
    # Exact full-map semantics are preserved:
    # * override hit  (lemma(k) = v, v in dict)  -> expanded row, EXACT tier;
    # * destem-tier matching is suppressed against expanded rows (``_exp``)
    #   and for override KEYS whose destem collides with a dictionary token
    #   (``colliding`` — an override key must never fall through to destem,
    #   the override short-circuits it in lemma_expr semantics);
    # * everything else destems as before.
    #
    # The relevant dictionary tokens come from ONE bounded probe job that
    # works at ANY dictionary size: probe the dim's first/last tokens
    # against the (small, fixed) set of override values plus destems of
    # override keys — the result is at most |override map| rows, never the
    # full token set, so a multi-million-term gazetteer pays one tiny
    # broadcast-dim scan, not a giant driver collect.
    spark = dictionary.sparkSession
    ov = dict(lemma_overrides or {})

    def _py_destem(k: str) -> str | None:
        if k.endswith("'s") and len(k) > 2:
            return k[:-2]
        if k.endswith("s") and len(k) > 3:
            return k[:-1]
        return None

    if ov:
        probe_vals = sorted(
            set(ov.values()) | {d for k in ov if (d := _py_destem(k)) is not None}
        )
        last_tok = F.element_at("term_tokens", F.col("n"))
        hit_rows = (
            dictionary.select(
                F.explode(F.array(F.col("first_tok"), last_tok)).alias("tk"),
                (F.col("n") == 1).alias("single"),
            )
            .where(F.col("tk").isin(probe_vals))
            .groupBy("tk")
            .agg(F.max("single").alias("single"))
            .collect()
        )
        dict_hits = {r["tk"] for r in hit_rows}
        singles = {r["tk"] for r in hit_rows if r["single"]}
        exp_pairs = [(p, s) for p, s in sorted(ov.items()) if s in dict_hits]
        colliding = sorted(
            k for k in ov if (ds := _py_destem(k)) is not None and ds in dict_hits
        )
    else:
        exp_pairs, colliding = [], []

    d0 = dictionary.withColumn("_exp", F.lit(0))
    if exp_pairs:
        inv = F.broadcast(
            spark.createDataFrame(exp_pairs, "plural string, singular string")
        )
        exp_rows = (
            dictionary.join(
                inv, F.element_at("term_tokens", F.col("n")) == F.col("singular")
            )
            .withColumn(
                "term_tokens",
                F.concat(
                    F.slice("term_tokens", 1, F.col("n") - 1), F.array(F.col("plural"))
                ),
            )
            .withColumn("first_tok", F.element_at("term_tokens", 1))
            .drop("plural", "singular")
            .withColumn("_exp", F.lit(1))
        )
        d0 = d0.unionByName(exp_rows.select(*d0.columns))
        if firsts is not None:
            # plurals expanded into single-token terms become anchor
            # first-tokens (multi-token expansions only change the LAST
            # token, so the anchor IN-set is unaffected by them)
            firsts = sorted(set(firsts) | {p for (p, s) in exp_pairs if s in singles})

    # --- stage 1: anchor detection (allocation-lean) ------------------------
    # The hot path is ALLOCATION-BANDWIDTH bound, not CPU bound: building
    # per-token window arrays made 8 cores ~= 32 cores. So: explode bare
    # tokens (ONE array per sentence), derive match keys as SCALAR
    # expressions per exploded row (whole-stage-codegen'd), and filter to
    # anchor hits before anything heavier exists. The plural/possessive
    # destem variant ('ds', boundary-regex suffix semantics) is only legal on
    # the term's LAST token; for n==1 the anchor IS the last token.
    key3 = ["conv_id", "turn_idx", "sent_idx"]
    toks_df = sentences.select(
        *key3, F.posexplode(F.split(F.col("sent_text"), " ")).alias("pos0", "tok")
    )
    core = token_core_expr(F.col("tok"))
    key = F.lower(core)
    if colliding:
        key_ds_expr = F.when(
            ~F.col("key").isin(colliding), destem_expr(F.col("key"))
        )
    else:
        key_ds_expr = destem_expr(F.col("key"))
    keyed = toks_df.withColumn("key", key).withColumn("key_ds", key_ds_expr)
    if firsts is not None:
        keyed = keyed.filter(
            F.col("key").isin(firsts)
            | F.coalesce(F.col("key_ds").isin(firsts), F.lit(False))
        )
    cand_filter = (
        (lambda c: c["k"].isNotNull() & c["k"].isin(firsts))
        if firsts is not None
        else (lambda c: c["k"].isNotNull())
    )
    anchors = (
        keyed.select(
            *key3,
            "pos0",
            F.explode(
                F.filter(
                    F.array(
                        F.struct(F.col("key").alias("k"), F.lit("exact").alias("v")),
                        F.struct(F.col("key_ds").alias("k"), F.lit("ds").alias("v")),
                    ),
                    cand_filter,
                )
            ).alias("c"),
        )
        .select(*key3, "pos0", F.col("c")["k"].alias("anchor_key"), F.col("c")["v"].alias("variant"))
    )

    d = F.broadcast(d0)
    # the destem ('ds') anchor tier is legal only for single-token terms and
    # only against NON-expanded rows (an expanded plural row reached via a
    # destemmed anchor would be double normalization)
    cand = anchors.join(d, anchors["anchor_key"] == d["first_tok"], "inner").filter(
        (F.col("variant") == "exact") | ((F.col("n") == 1) & (F.col("_exp") == 0))
    )

    # --- stage 2: window validation on candidate rows only ------------------
    # Join candidates back to the sentence table on the sentence key. Both
    # sides descend from the SAME normalize exchange (hash(conv_id,turn_idx)
    # clusters every sentence key), so this is a co-partitioned join — no new
    # shuffle. Candidates are ~O(dictionary hit rate) per sentence, so the
    # window re-tokenization below runs per CANDIDATE, not per token.
    withs = cand.join(sentences.select(*key3, "sent_text"), key3, "inner")

    n, pos0 = F.col("n"), F.col("pos0")
    toks2 = F.split(F.col("sent_text"), " ")
    window = F.slice(toks2, pos0 + 1, n)
    wkeys = F.transform(window, lambda t: F.lower(token_core_expr(t)))
    in_bounds = n <= (F.size(toks2) - pos0)
    # Catalyst may reorder conjuncts: indexed access stays try_*/clamped.
    mid_len = F.greatest(n - 2, F.lit(0))
    mid_ok = (n <= 2) | (
        F.slice(wkeys, 2, mid_len) == F.slice(F.col("term_tokens"), 2, mid_len)
    )
    last_dict = F.element_at("term_tokens", n)
    last_key = F.try_element_at(wkeys, n)
    # destem tier: non-expanded rows only, and never for override keys
    # (the override short-circuits destem in lemma semantics)
    ds_last_ok = (F.col("_exp") == 0) & (
        F.coalesce(destem_expr(last_key), F.lit("")) == last_dict
    )
    if colliding:
        ds_last_ok = ds_last_ok & ~last_key.isin(colliding)
    last_ok = (last_key == last_dict) | ds_last_ok
    match = F.when(n == 1, F.lit(True)).otherwise(in_bounds & mid_ok & last_ok)
    j = (
        withs.withColumn("_w", window)
        .withColumn("_wk", wkeys)
        .filter(match)
    )

    # offsets: start of token pos0 = sum(len+1) over preceding tokens —
    # an O(pos) fold over a slice, no offsets array materialized.
    prefix_len = F.aggregate(
        F.slice(toks2, 1, pos0), F.lit(0), lambda acc, t: acc + F.length(t) + 1
    )
    first_tok = F.element_at("_w", 1)
    last_tok = F.try_element_at(F.col("_w"), n)
    lead1 = token_lead_expr(first_tok)
    lead_n = token_lead_expr(last_tok)
    # char length of the window = joined length of its tokens
    win_prefix = F.aggregate(
        F.slice(F.col("_w"), 1, n - 1), F.lit(0), lambda acc, t: acc + F.length(t) + 1
    )
    start = (prefix_len + lead1).cast("int")
    end = (prefix_len + win_prefix + lead_n + F.length(token_core_expr(last_tok))).cast("int")
    # surface from the joined window tokens (single spaces by clean_text)
    joined_window = F.concat_ws(" ", F.col("_w"))
    spans = (
        j.withColumn("_start", start)
        .withColumn("_end", end)
        .withColumn("_joined", joined_window)
        .withColumn("_lead1", lead1.cast("int"))
        .select(
            *key3,
            F.col("_start").alias("start"),
            F.col("_end").alias("end"),
            "term",
            "label",
            "ent_id",
            F.expr("substring(_joined, _lead1 + 1, _end - _start)").alias("surface"),
        )
    )
    # Exact-duplicate dedup happens inside drop_contained (array_distinct on
    # the per-sentence array) — one shuffle covers both dedup and containment.
    return drop_contained(spans)


def drop_contained(spans: DataFrame) -> DataFrame:
    """Longest-match preference: drop spans strictly contained in a longer
    span of the same sentence (PhraseMatcher longest-match semantics).

    Implemented as collect_list per sentence + a pairwise higher-order
    ``filter``/``exists`` over the (tiny) per-sentence span array, then an
    explode back — ONE computation of the input and one small shuffle,
    instead of an anti self-join that would recompute the whole upstream
    tagging DAG a second time. Spans-per-sentence is bounded (~10), so the
    O(k²) per-row check is constant work.
    """
    payload = F.struct("start", "end", "term", "label", "ent_id", "surface")
    g = spans.groupBy("conv_id", "turn_idx", "sent_idx").agg(
        F.array_distinct(F.collect_list(payload)).alias("arr")
    )
    # (a) homonym-id dedup: per (start, end, label) keep the min ent_id —
    # array-side, so downstream label resolution needs no span-level
    # aggregate at all (winner filter is per-label, so pre-picking the min
    # ent within each label commutes with it);
    # (b) longest-match containment drop.
    deduped = F.filter(
        F.col("arr"),
        lambda a: ~F.exists(
            F.col("arr"),
            lambda b: (b["start"] == a["start"])
            & (b["end"] == a["end"])
            & (b["label"] == a["label"])
            & (b["ent_id"] < a["ent_id"]),
        ),
    )
    kept = F.filter(
        deduped,
        lambda a: ~F.exists(
            deduped,
            lambda b: (b["start"] <= a["start"])
            & (a["end"] <= b["end"])
            & ((b["end"] - b["start"]) > (a["end"] - a["start"])),
        ),
    )
    return (
        g.select("conv_id", "turn_idx", "sent_idx", F.explode(kept).alias("s"))
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.col("s")["start"].alias("start"),
            F.col("s")["end"].alias("end"),
            F.col("s")["term"].alias("term"),
            F.col("s")["label"].alias("label"),
            F.col("s")["ent_id"].alias("ent_id"),
            F.col("s")["surface"].alias("surface"),
        )
    )
