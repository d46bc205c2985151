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
  5. longest-match containment dedup via a partition-local anti self-join.

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
REDLIST_SUFFIX = r"(genesis|cytic|ial|yal)$"


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
    """
    df = sentences.withColumn("toks", F.split(F.col("sent_text"), " "))
    df = df.withColumn("starts", offsets_expr(F.col("toks")))
    df = df.withColumn("cores", F.transform(F.col("toks"), token_core_expr))
    df = df.withColumn("leads", F.transform(F.col("toks"), token_lead_expr))
    df = df.withColumn("keys", F.transform(F.col("cores"), F.lower))
    return df.withColumn("keys_ds", F.transform(F.col("keys"), destem_expr))


def tag_mentions(sentences: DataFrame, dictionary: DataFrame) -> DataFrame:
    """Detect dictionary mentions in sentences; returns one row per span.

    Output: ``conv_id, turn_idx, sent_idx, start, end, surface, term, label,
    ent_id`` with char offsets into ``sent_text`` satisfying the invariant
    ``substring(sent_text, start+1, end-start) == surface``
    (article_normaliser.py:285-324 alignment check, enforced downstream).
    """
    tok = tokenize_sentences(sentences)

    # --- plan-time dictionary stats -----------------------------------------
    # The dictionary is a broadcast dim by design, so collecting its distinct
    # first tokens (anchor IN-set) and its max term length (window width) at
    # plan time is legitimate driver work. For dictionaries too large to
    # collect, drop the IN-set pre-filter; the broadcast join is unchanged.
    stats = dictionary.agg(
        F.collect_set("first_tok").alias("firsts"), F.max("n").alias("max_n")
    ).collect()[0]
    firsts, max_n = sorted(stats["firsts"]), int(stats["max_n"] or 1)

    # Anchor candidates: (pos, key, variant) plus FIXED-WIDTH windows (max_n
    # elements) of the per-token arrays. Carrying windows instead of the full
    # sentence arrays keeps the exploded row size O(max_n) regardless of
    # sentence length — on long documents this is the difference between a
    # narrow stage and a multi-GB row explosion. 'ds' implements the
    # boundary-regex plural/possessive suffix and is only legal when it lands
    # on the term's LAST token (for n==1 the anchor IS the last token).
    def _cand_at(i):
        k_exact = F.try_element_at(F.col("keys"), i + 1)
        k_ds = F.try_element_at(F.col("keys_ds"), i + 1)
        win = [
            F.slice(F.col("keys"), i + 1, max_n).alias("wk"),
            F.slice(F.col("keys_ds"), i + 1, max_n).alias("wds"),
            F.slice(F.col("starts"), i + 1, max_n).alias("wst"),
            F.slice(F.col("leads"), i + 1, max_n).alias("wld"),
            F.slice(F.col("cores"), i + 1, max_n).alias("wco"),
            F.slice(F.col("toks"), i + 1, max_n).alias("wtk"),
        ]
        return F.filter(
            F.array(
                F.struct(k_exact.alias("k"), F.lit("exact").alias("v"), *win),
                F.struct(k_ds.alias("k"), F.lit("ds").alias("v"), *win),
            ),
            lambda c: c["k"].isNotNull() & c["k"].isin(firsts),
        )

    cands = F.flatten(
        F.transform(F.sequence(F.lit(0), F.size("keys") - 1), _cand_at)
    )
    exploded = tok.select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        F.explode(cands).alias("c"),
    ).select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        F.col("c")["k"].alias("anchor_key"),
        F.col("c")["v"].alias("variant"),
        F.col("c")["wk"].alias("wk"),
        F.col("c")["wds"].alias("wds"),
        F.col("c")["wst"].alias("wst"),
        F.col("c")["wld"].alias("wld"),
        F.col("c")["wco"].alias("wco"),
        F.col("c")["wtk"].alias("wtk"),
    )

    d = F.broadcast(dictionary)
    j = exploded.join(d, exploded["anchor_key"] == d["first_tok"], "inner")

    n = F.col("n")
    in_bounds = n <= F.size("wk")
    # Catalyst may reorder conjuncts, so every indexed access must be
    # try_* / length-clamped rather than relying on short-circuit order.
    mid_len = F.greatest(n - 2, F.lit(0))
    mid_ok = (n <= 2) | (
        F.slice(F.col("wk"), 2, mid_len) == F.slice(F.col("term_tokens"), 2, mid_len)
    )
    last_dict = F.element_at("term_tokens", n)
    last_ok = (
        (F.try_element_at(F.col("wk"), n) == last_dict)
        | (F.coalesce(F.try_element_at(F.col("wds"), n), F.lit("")) == last_dict)
    )
    match = F.when(n == 1, F.lit(True)).otherwise(
        (F.col("variant") == "exact") & in_bounds & mid_ok & last_ok
    )
    j = j.filter(match)

    start = F.element_at("wst", 1) + F.element_at("wld", 1)
    end = (
        F.try_element_at(F.col("wst"), n)
        + F.try_element_at(F.col("wld"), n)
        + F.length(F.try_element_at(F.col("wco"), n))
    )
    # surface is reconstructed from the token window (tokens joined by the
    # single spaces guaranteed by clean_text) instead of substring-ing the
    # sentence text — this keeps sent_text out of the exploded rows AND out
    # of the span shuffle payload entirely. substring equality vs the turn
    # text still holds by construction (validate_alignment re-checks it).
    joined_window = F.concat_ws(" ", F.slice(F.col("wtk"), 1, n))
    surface = F.expr(
        "substring(_joined, element_at(wld, 1) + 1, _end - _start)"
    )
    spans = (
        j.withColumn("_joined", joined_window)
        .withColumn("_start", start.cast("int"))
        .withColumn("_end", end.cast("int"))
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.col("_start").alias("start"),
            F.col("_end").alias("end"),
            "term",
            "label",
            "ent_id",
            surface.alias("surface"),
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
    kept = F.filter(
        F.col("arr"),
        lambda a: ~F.exists(
            F.col("arr"),
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
