"""End-to-end KG-construction DAG (SURVEY.md §7.1, BASELINE.json north_star).

transcripts(conv_id, turn_idx, role, text, tool, ts)
  -> P0 normalize (dedup/null/header filters + clean_text exprs)
  -> P1 sentencize (lookbehind split + aggregate offset scan, no UDF)
  -> P2 mention detection (token-blocked broadcast dictionary join)
  -> P4/P5 disambiguation + canonicalization (mode/priority + CC clusters)
  -> P6 triples + node/edge graph tables

One linear declarative DAG: Catalyst sees the whole plan, pushes filters into
the scan, prunes columns, broadcasts the dictionary, and AQE right-sizes the
two real shuffles (term-count groupBy; triple dedup). The span table is
persisted once because it feeds both the label-resolution aggregate and the
triple projection (deliberate reuse point, SURVEY.md §4 caching row).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otar3088_spark.operators.canonicalize import entity_clusters, resolve_labels
from otar3088_spark.operators.sentencize import normalize_turns, sentencize
from otar3088_spark.operators.tagging import prepare_dictionary, tag_mentions
from otar3088_spark.operators.triples import causes_triples, graph_tables, mention_triples


def _span_stage_fingerprint(
    dictionary: DataFrame, use_model: bool, scorer, lemma_overrides=None
) -> str:
    """Hex fingerprint of everything the span stage's output depends on
    besides the transcripts: the model toggle, the scorer identity, and an
    order-insensitive content hash of the dictionary (SUM of per-row
    xxhash64 plus the row count over the JSON-serialized rows — one
    aggregate over the broadcast dim, negligible next to the pipeline).
    Sum+count, not bit_xor: xor cancels rows with even multiplicity, so a
    raw input {A, A, B} would fingerprint identically to {B} and could
    silently resume a stale span snapshot."""
    import hashlib

    row = dictionary.select(
        # decimal(38,0) accumulator: ANSI mode (Spark 4 default) would raise
        # on bigint sum overflow for large dictionaries
        F.sum(F.xxhash64(F.to_json(F.struct(*dictionary.columns))).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("c"),
    ).first()
    # Custom scorers fingerprint by OBJECT identity (qualname + id), not
    # qualname alone: two differently-configured same-qualname closures must
    # never share a snapshot (stale-config reuse). Consequence: a custom-
    # scorer stage never resumes across process restarts (id changes ->
    # recompute, which is the safe direction); the default/stand-in paths
    # (scorer None) keep stable names and full cross-run resume.
    if scorer is None:
        scorer_id = "none"
    else:
        from otar3088_spark.operators.inference import _scorer_cache_key

        scorer_id = _scorer_cache_key("fp", scorer)
    lemma_fp = hashlib.sha1(
        repr(sorted((lemma_overrides or {}).items())).encode()
    ).hexdigest()[:8]
    key = (
        f"model={bool(use_model or scorer is not None)};scorer={scorer_id};"
        f"dict={row['h']}:{row['c']};lemma={lemma_fp}"
    )
    return hashlib.sha1(key.encode()).hexdigest()[:12]


@dataclass
class KGResult:
    sentences: DataFrame
    spans: DataFrame
    resolved_spans: DataFrame
    clusters: DataFrame
    triples: DataFrame
    nodes: DataFrame
    edges: DataFrame


def build_kg(
    transcripts: DataFrame,
    dictionary: DataFrame,
    events: DataFrame | None = None,
    salt_partitions: int | None = None,
    persist_spans: bool = False,
    staging_dir: str | None = None,
    use_model: bool = False,
    model_scorer=None,
    lemma_overrides: dict[str, str] | None = None,
) -> KGResult:
    """Run the full pipeline; returns every intermediate as a DataFrame.

    All outputs are deterministic order-insensitive sets keyed by stable ids —
    parity with the (imap_unordered-nondeterministic, split2sent_par.py:303)
    reference is defined on triple sets, per SURVEY.md §7.3(c).

    ``staging_dir``: when set, the span table is snapshotted to parquet and
    read back before label resolution. resolve_labels consumes spans twice
    (winner counts + join-back) and column pruning gives the two subplans
    different exchanges, so without materialization the whole tagging DAG
    executes twice. A parquet snapshot makes the second pass a pruned
    two-column scan — and doubles as the north-rule per-stage checkpoint
    (on a cluster this is the Iceberg table boundary).
    """
    # F8 lemmatization: the public irregular-plural table is the DEFAULT
    # override map (reference lemma-dict linking generalizes beyond the
    # rule-based destem, labelstudio_e2e.py:181-187). Pass {} to disable.
    if lemma_overrides is None:
        from otar3088_spark.functions.text import IRREGULAR_PLURALS

        lemma_overrides = IRREGULAR_PLURALS
    normalized = normalize_turns(transcripts, salt_partitions=salt_partitions)
    sentences = sentencize(normalized)
    # Merged path: the sentence subtree feeds BOTH the gazetteer tagging
    # branch and the model-scoring branch, and Spark only reuses subplans at
    # exchange boundaries — the narrow sentencize work above the normalize
    # exchange would execute once per branch (measured 1.4 s of the 6.6 s
    # 200k-turn kg_full, round 7). Persist it for the duration of THIS
    # build's span-snapshot materialization only: the staging write is the
    # one action inside this function, after which no span consumer reads
    # sentences again, so the cache is dropped before returning — each
    # bench/pipeline invocation still computes sentences from its inputs
    # exactly once (no cross-run reuse; the unpersist is unconditional).
    _sent_cache = None
    if (use_model or model_scorer is not None) and staging_dir is not None:
        _sent_cache = sentences.persist()
    dict_prepared = prepare_dictionary(dictionary)
    spans = tag_mentions(sentences, dict_prepared, lemma_overrides=lemma_overrides)
    if use_model or model_scorer is not None:
        # North-star transformer branch: batched model inference
        # (mapInPandas, per-executor singleton — a real HF scorer plugs in
        # via model_scorer), entity-link candidate generation against the
        # broadcast dictionary, then source-precedence merge with the
        # gazetteer spans (dict wins exact span collisions). One extra
        # shuffle total (the merge groupBy); the model pass itself is a
        # narrow Arrow-batched map over sentences.
        from otar3088_spark.operators.inference import (
            link_model_mentions,
            merge_spans_with_model,
            model_mentions,
        )

        model_sp = model_mentions(sentences, scorer=model_scorer)
        linked = link_model_mentions(
            model_sp, dict_prepared, lemma_overrides=lemma_overrides
        )
        spans = merge_spans_with_model(spans, linked)
    if staging_dir is not None:
        # Stage boundary through the snapshot store: parquet data + atomic
        # manifest with per-partition lineage rows (north-rule P7). A re-run
        # pointed at the same staging_dir resumes from the committed span
        # snapshot and recomputes only the downstream tail.
        #
        # The stage name carries a CONFIG FINGERPRINT (use_model, scorer
        # identity, content hash of the dictionary snapshot): re-running
        # against the same staging_dir with a different configuration gets a
        # different stage name and recomputes, instead of silently serving a
        # stale span snapshot built under the old config. The dictionary
        # hash is one tiny job (the dictionary is the broadcast dim).
        from otar3088_spark.io.checkpoint import SnapshotStore

        store = SnapshotStore(staging_dir)
        _spans_df = spans
        stage = (
            "spans-"
            + _span_stage_fingerprint(dictionary, use_model, model_scorer, lemma_overrides)
        )
        spans = store.get_or_compute(
            _spans_df.sparkSession, stage, lambda: _spans_df
        )
        if _sent_cache is not None:
            # snapshot committed (or resumed) -> nothing downstream reads
            # the sentence subtree again; free the cache so repeated
            # builds in one session never serve stale-by-timing data
            _sent_cache.unpersist()
    elif persist_spans:
        spans = spans.persist()
    resolved = resolve_labels(spans)
    clusters = entity_clusters(dict_prepared)
    triples = mention_triples(resolved, clusters)
    if events is not None:
        triples = triples.unionByName(causes_triples(events))
    nodes, edges = graph_tables(triples)
    return KGResult(
        sentences=sentences,
        spans=spans,
        resolved_spans=resolved,
        clusters=clusters,
        triples=triples,
        nodes=nodes,
        edges=edges,
    )


def validate_alignment(spans: DataFrame, sentences: DataFrame) -> DataFrame:
    """F16 invariant check as a DataFrame: rows violating
    ``substring(sent_text, start+1, end-start) == surface`` (must be empty).
    Mirrors article_normaliser.py:285-324's bounds/text validation. Spans
    deliberately do not carry sentence text (shuffle-payload hygiene), so the
    check re-joins the sentence table on the stable key — which also makes it
    a genuine cross-check of offset construction, not a tautology."""
    j = spans.join(
        sentences.select("conv_id", "turn_idx", "sent_idx", "sent_text"),
        ["conv_id", "turn_idx", "sent_idx"],
        "left",
    )
    # surface IS NULL must count as a violation: the inequality evaluates
    # to NULL for NULL surface and filter() would drop exactly the broken
    # rows this check exists to catch
    return j.filter(
        F.col("sent_text").isNull()
        | F.col("surface").isNull()
        | (F.expr("substring(sent_text, start + 1, end - start)") != F.col("surface"))
    )
