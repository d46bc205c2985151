"""Paged REST search source — S10/S11 pattern (out of the hot path).

The reference fetches EuropePMC search pages and full-text XML inside loops
with a 1 s delay (extract_articles.py:67-144, split2sent_par.py:36-59). The
Spark-first shape for *ingest* sources like this:

* small query tables fan out over executors via ``mapInPandas`` — one HTTP
  session per executor, idempotent (deterministic page keys), rate-limited;
* the fetched rows become a normal DataFrame for the declarative pipeline.

The sandbox has no network, so the fetcher is injected: tests pass a
deterministic fake; production passes a requests-backed callable. The Spark
plumbing (Arrow batches, per-executor session reuse, schema) is the real
thing and is what this module owns.
"""

from __future__ import annotations

import itertools
import weakref
from collections import OrderedDict
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SEARCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("search_query", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("pub_type", T.StringType()),
    ]
)

# fetcher(query, page) -> list[(doc_id, title, pub_type)]
Fetcher = Callable[[str, int], list[tuple[str, str, str]]]

# per-worker fetcher cache, LRU-bounded: with per-object keys a long-lived
# reused worker would otherwise accumulate one (possibly connection-holding)
# fetcher per job forever
_SESSION: OrderedDict[str, object] = OrderedDict()
_SESSION_MAX = 8

# Driver-side fetcher identity tokens. id() alone is NOT identity — CPython
# reuses a freed object's address, so a loop building one closure per job
# (same qualname, recycled address) would collide keys and revive the exact
# stale-fetcher bug the key exists to prevent. A token from this counter is
# handed out once per LIVE object (WeakKeyDictionary: entry dies with the
# object, a recycled address gets a FRESH token); non-weak-referenceable
# callables get a fresh token per call — losing cross-job session reuse,
# never correctness.
_FETCHER_TOKENS: "weakref.WeakKeyDictionary[object, int]" = weakref.WeakKeyDictionary()
_FETCHER_SEQ = itertools.count()


def _fetcher_token(fetcher) -> int:
    try:
        tok = _FETCHER_TOKENS.get(fetcher)
        if tok is None:
            tok = next(_FETCHER_SEQ)
            _FETCHER_TOKENS[fetcher] = tok
        return tok
    except TypeError:
        return next(_FETCHER_SEQ)


def _session_key(fetcher, cache_key: str | None) -> str:
    """Resolve the per-worker session-cache slot name for a fetcher.

    `is not None` (not truthiness): an explicit-but-empty cache_key must
    name its own slot, not silently fall back to the fetcher-token key.
    """
    if cache_key is not None:
        return cache_key
    return "fetcher:" + (
        "fake"
        if fetcher is None
        else f"{fetcher.__module__}.{getattr(fetcher, '__qualname__', repr(fetcher))}@{_fetcher_token(fetcher)}"
    )


def fake_fetcher(query: str, page: int) -> list[tuple[str, str, str]]:
    """Deterministic stand-in for the EPMC REST API (tests/CI)."""
    import hashlib

    n = 3 + hashlib.md5(f"{query}|{page}".encode()).digest()[0] % 3
    # ids via hashlib, NOT the builtin hash(): string hashing is
    # PYTHONHASHSEED-salted per process, so builtin-hash ids would differ
    # between runs/workers and break the documented idempotent-re-run
    # contract (the snapshot store would dedup nothing)
    return [
        (
            "PMC"
            + str(
                int.from_bytes(
                    hashlib.md5(f"{query}|{page}|{i}".encode()).digest()[:4], "big"
                )
                % 10_000_000
            ).zfill(7),
            f"{query} result {page}-{i}",
            "journal article" if i % 4 else "retraction of publication",
        )
        for i in range(n)
    ]


def fetch_search_results(
    queries_df: DataFrame,
    pages: int = 2,
    fetcher: Fetcher | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """Fan a (search_query) table out to executors; each task fetches its
    queries' pages through a per-executor session. Deterministic keys
    (query, page) make re-runs idempotent — pair with the snapshot store to
    skip completed fetches. ``cache_key`` names the per-worker session slot
    for callers who construct fetchers dynamically and want explicit reuse
    semantics across jobs."""

    # per-FETCHER session key: a reused Python worker (the default) must
    # never serve a previously-cached fetcher to a job that passed a
    # different one — the cache exists to share connection state across
    # batches of ONE fetcher, not to pin the first fetcher forever.
    # qualname alone is NOT identity: two closures minted by the same
    # factory (same qualname, different base URL) must not share a slot, so
    # a driver-side per-object token joins the key (_fetcher_token above —
    # address-reuse-proof, unlike raw id()). The token is resolved HERE
    # (driver), closed over, and therefore stable for every task of this
    # job; same-object reuse across jobs keeps hitting the same slot.
    fkey = _session_key(fetcher, cache_key)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f = _SESSION.get(fkey) or fetcher or fake_fetcher
        _SESSION[fkey] = f
        _SESSION.move_to_end(fkey)
        while len(_SESSION) > _SESSION_MAX:
            _SESSION.popitem(last=False)
        for pdf in batches:
            rows = []
            for q in pdf["search_query"]:
                for page in range(pages):
                    for doc_id, title, pub_type in f(q, page):
                        rows.append((q, page, doc_id, title, pub_type))
            yield pd.DataFrame(rows, columns=[x.name for x in SEARCH_RESULT_SCHEMA.fields])

    return queries_df.select("search_query").mapInPandas(run, SEARCH_RESULT_SCHEMA)


def clean_search_results(results: DataFrame) -> DataFrame:
    """The reference's post-search hygiene (extract_articles.py:168-188):
    not-null ids, first-wins dedup, drop retractions."""
    from pyspark.sql import functions as F

    return (
        results.filter(F.col("doc_id").isNotNull())
        .dropDuplicates(["doc_id"])
        .filter(F.col("pub_type") != "retraction of publication")
    )
