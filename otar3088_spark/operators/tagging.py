"""Gazetteer mention detection — stage P2: the token-blocked broadcast join.

The reference implements dictionary tagging three ways: an in-process lemma
hash-map with a sliding n-gram window (labelstudio_e2e.py:196-240), a spaCy
PhraseMatcher over ``nlp.pipe`` batches (COVID_ner_clean.ipynb cell 7), and a
per-term boundary regex ``(?<!\\w)term(?:s|'s)?(?!\\w)`` (labelstudio_e2e.py:
171-178). All three are per-row Python. Here the same semantics are ONE
declarative join:

  1. tokenize each sentence by space on cleaned text; compute char offsets
     with an ``aggregate`` cumulative scan (per-row JVM, no shuffle);
  2. explode tokens and derive ONE prenorm anchor key per token
     (``coalesce(destem, key)`` — no conditionals, no struct allocation);
  3. broadcast-join against the lemma-normalized dictionary blocked on the
     term's FIRST normalized token (the 'token-blocked' key — blocks
     candidate pairs to ~|dict-first-token| matches per token instead of
     |dict| regex scans per sentence); irregular forms reach the join via
     dim-side alias rows, never per-token conditionals;
  4. validate the full n-token window with whole-window lemma equality
     (``zip_with`` + ``forall`` over norm_key_expr) — still pure Catalyst
     expressions, evaluated per candidate only;
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
    norm_key_expr,
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

    Matching is WHOLE-WINDOW lemma equality (labelstudio_e2e.py:179-185
    lemmatizes every token of the dictionary term; :218-226 compares
    ``window_lemmas == lemma_tokens`` position-by-position): a window matches
    a term iff ``norm(window_key_i) == norm(dict_token_i)`` at EVERY
    position, with ``norm`` = irregular-override / override-value fixpoint /
    rule destem / identity (functions/text.py norm_key_expr). So "mice
    models" matches dictionary "mouse model" — inflection on non-head tokens
    links exactly as in the reference.
    """
    spark = dictionary.sparkSession
    ov = dict(lemma_overrides or {})

    def _py_prenorm(k: str) -> str:
        if k.endswith("'s") and len(k) > 2:
            return k[:-2]
        if k.endswith("s") and len(k) > 3:
            return k[:-1]
        return k

    # --- dictionary-side normalization (dim work, off the hot path) ---------
    # Every dictionary token is normalized with the FULL lemma function; rows
    # whose normalized token sequences collide within (ent_id, label) merge
    # to one row keeping the lexicographically smallest surface term
    # (deterministic output). The override CASE chain runs only over the
    # broadcast dim — measured round 2: even a one-entry conditional wrapped
    # around destem in the fused per-token stage cost 15-40% of the whole
    # pipeline (conditional branches are excluded from codegen subexpression
    # elimination), so the per-token hot path below stays a bare
    # coalesce(destem, key) with NO override/collision conditionals ever.
    d_norm = (
        dictionary.withColumn(
            "nd_tokens", F.transform(F.col("term_tokens"), lambda t: norm_key_expr(t, ov))
        )
        .groupBy("ent_id", "label", "nd_tokens")
        .agg(F.min("term").alias("term"))
        .withColumn("n", F.size("nd_tokens").cast("int"))
        .withColumn("first_nd", F.element_at("nd_tokens", 1))
    )

    # --- anchor alias rows ---------------------------------------------------
    # Stage 1 anchors on PRENORM(first corpus token) = coalesce(destem, key).
    # For corpus tokens where prenorm != norm the dim grows alias rows whose
    # join key is the prenorm form, so the anchor join stays a broadcast
    # EQUI-join with zero hot-path conditionals:
    #   (i)  override keys:    "mice"  -> alias first_tok "mice"  (prenorm of
    #        an irregular plural is itself or its naive destem);
    #   (ii) override values ending in s: corpus "metastasis" prenorms to
    #        "metastasi" while the dict token stays "metastasis" — alias row
    #        keyed by the prenorm form.
    # The alias table is a pure-Python literal derived from the override map
    # (<= 2|ov| rows) broadcast-joined to the dim: no driver probe of the
    # dictionary at ANY dictionary size. Stage 2 re-validates position 1 with
    # the full norm, so over-generated anchors (e.g. corpus "axe" hitting the
    # alias of override "axes"->"axis") are rejected there — the round-2/3
    # ``colliding`` suppression machinery is subsumed by construction.
    alias_pairs = sorted(
        {(_py_prenorm(k), v) for k, v in ov.items() if _py_prenorm(k) != v}
        | {(_py_prenorm(v), v) for v in ov.values() if _py_prenorm(v) != v}
    )
    d0 = d_norm.withColumn("first_tok", F.col("first_nd"))
    if alias_pairs:
        al = F.broadcast(
            spark.createDataFrame(alias_pairs, "alias_first string, nd_first string")
        )
        extra = (
            d_norm.join(al, F.col("first_nd") == F.col("nd_first"))
            .withColumn("first_tok", F.col("alias_first"))
            .drop("alias_first", "nd_first")
        )
        d0 = d0.unionByName(extra.select(*d0.columns)).dropDuplicates(
            ["ent_id", "label", "nd_tokens", "first_tok"]
        )

    # --- plan-time anchor IN-set --------------------------------------------
    # The dictionary is a broadcast dim by design, so collecting its distinct
    # anchor tokens at plan time is legitimate driver work — but only up to a
    # point: above ``max_prefilter_terms`` distinct tokens the pre-filter is
    # skipped automatically (the broadcast hash join prunes non-anchors just
    # as correctly, one narrow stage later). ONE bounded job decides and
    # fetches: limit(max+1) caps driver memory.
    firsts: list[str] | None = sorted(
        r["first_tok"]
        for r in d0.select("first_tok").distinct().limit(max_prefilter_terms + 1).collect()
    )
    if len(firsts) > max_prefilter_terms:
        firsts = None

    # --- stage 1: anchor detection (allocation-lean) ------------------------
    # The hot path is ALLOCATION-BANDWIDTH bound, not CPU bound: explode bare
    # tokens (ONE array per sentence), derive the single prenorm anchor key
    # as a SCALAR expression per exploded row (whole-stage-codegen'd, no
    # struct-array explode, no conditionals beyond destem itself), and filter
    # to anchor hits before anything heavier exists.
    key3 = ["conv_id", "turn_idx", "sent_idx"]
    toks_df = sentences.select(
        *key3, F.posexplode(F.split(F.col("sent_text"), " ")).alias("pos0", "tok")
    )
    keyed = toks_df.withColumn("key", F.lower(token_core_expr(F.col("tok")))).withColumn(
        "akey", F.coalesce(destem_expr(F.col("key")), F.col("key"))
    )
    if firsts is not None:
        keyed = keyed.filter(F.col("akey").isin(firsts))
    anchors = keyed.select(*key3, "pos0", F.col("akey").alias("anchor_key"))

    d = F.broadcast(d0)
    cand = anchors.join(d, anchors["anchor_key"] == d["first_tok"], "inner")

    # --- stage 2: window validation on candidate rows only ------------------
    # Join candidates back to the sentence table on the sentence key. Both
    # sides descend from the SAME normalize exchange (hash(conv_id,turn_idx)
    # clusters every sentence key), so this is a co-partitioned join — no new
    # shuffle. Candidates are ~O(dictionary hit rate) per sentence, so the
    # full-norm window comparison below runs per CANDIDATE, not per token.
    withs = cand.join(sentences.select(*key3, "sent_text"), key3, "inner")

    n, pos0 = F.col("n"), F.col("pos0")
    toks2 = F.split(F.col("sent_text"), " ")
    window = F.slice(toks2, pos0 + 1, n)
    wkeys = F.transform(window, lambda t: F.lower(token_core_expr(t)))
    in_bounds = n <= (F.size(toks2) - pos0)
    # whole-window norm equality; zip_with pads a short (out-of-bounds)
    # window with NULL keys -> NULL comparison -> forall not TRUE, and the
    # explicit in_bounds conjunct keeps the intent readable.
    all_ok = F.forall(
        F.zip_with(
            wkeys, F.col("nd_tokens"), lambda w, dt: norm_key_expr(w, ov) == dt
        ),
        lambda x: x,
    )
    match = in_bounds & F.coalesce(all_ok, F.lit(False))
    j = withs.withColumn("_w", window).filter(match)

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
