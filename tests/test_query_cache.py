"""LRU query cache (search/LRUQueryCache.java:85 +
UsageTrackingQueryCachingPolicy.java roles).

Invariants under test:
- cached and uncached executions are bit-identical (the cache only
  memoizes filter-context match-sets, never changes semantics);
- the usage-tracking policy: TermQuery is never cached; costly shapes
  (prefix/phrase/spans) cache on the 2nd sighting; cheap boolean shapes
  on the 5th;
- LRU eviction unpersists the least-recently-used entry and bounds the
  number of pinned sets.
"""

from __future__ import annotations

import struct

import pytest

from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.df_executor import DFExecutor
from lucene_solr_spark.plans.query_cache import (
    LRUQueryCache,
    UsageTrackingPolicy,
    query_key,
)
from lucene_solr_spark.sources.corpus import corpus_to_spark

T = ir.TermQuery
C = ir.BooleanClause
O = ir.Occur


def B(*cs, msm=0):
    return ir.BooleanQuery(tuple(cs), msm)


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def rows(df):
    return sorted((r["doc_id"], bits(r["score"])) for r in df.collect())


@pytest.fixture(scope="module")
def index(spark):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=5)
    return build_index(corpus).persist()


# --------------------------------------------------------------- policy


def test_policy_never_caches_term_or_matchall():
    p = UsageTrackingPolicy()
    for _ in range(10):
        assert not p.should_cache(T("def"))
        assert not p.should_cache(ir.MatchAllDocsQuery())
    # never-cache survives boost/constant-score wrapping, like the
    # reference's unwrapping in shouldNeverCache
    assert not p.should_cache(ir.BoostQuery(T("def"), 2.0))


def test_policy_costly_on_second_sighting():
    p = UsageTrackingPolicy()
    q = ir.PrefixQuery("de")
    assert not p.should_cache(q)
    assert p.should_cache(q)
    # phrase + spans are costly too
    ph = ir.PhraseQuery(terms=("def", "main"))
    assert not p.should_cache(ph)
    assert p.should_cache(ph)


def test_policy_cheap_on_fifth_sighting():
    p = UsageTrackingPolicy()
    q = B(C(O.SHOULD, T("error")), C(O.SHOULD, T("warning")))
    seen = [p.should_cache(q) for _ in range(6)]
    assert seen == [False, False, False, False, True, True]


def test_policy_history_window_forgets():
    p = UsageTrackingPolicy(history_size=4)
    q = ir.PrefixQuery("de")
    assert not p.should_cache(q)
    # flood the window with other keys so the first sighting ages out
    for i in range(4):
        p.should_cache(B(C(O.SHOULD, T(f"t{i}"))))
    assert not p.should_cache(q)  # back to frequency 1
    assert p.should_cache(q)


# ---------------------------------------------------------------- cache


def test_cached_results_identical_and_hit_counted(spark, index):
    q = B(
        C(O.MUST, T("import")),
        C(O.FILTER, ir.PrefixQuery("de")),
        C(O.MUST_NOT, ir.PrefixQuery("zzzz")),
    )
    plain = DFExecutor(index, mode="float32")
    cache = LRUQueryCache(policy=UsageTrackingPolicy(costly_min=1, default_min=1))
    cached = DFExecutor(index, mode="float32", query_cache=cache)

    expect = rows(plain.matches(q))
    first = rows(cached.matches(q))
    assert cache.miss_count == 2 and cache.hit_count == 0
    assert len(cache) == 2  # prefix FILTER + term MUST_NOT both pinned
    second = rows(cached.matches(q))
    assert cache.hit_count == 2
    assert first == expect and second == expect


def test_scoring_clauses_not_cached(spark, index):
    cache = LRUQueryCache(policy=UsageTrackingPolicy(costly_min=1, default_min=1))
    ex = DFExecutor(index, mode="float32", query_cache=cache)
    q = B(C(O.MUST, T("import")), C(O.SHOULD, T("return")))
    ex.matches(q).count()
    # MUST/SHOULD run in scoring context — nothing enters the cache
    assert len(cache) == 0 and cache.miss_count == 0


def test_lru_eviction_unpersists(spark, index):
    cache = LRUQueryCache(
        max_entries=2,
        policy=UsageTrackingPolicy(costly_min=1, default_min=1),
    )
    ex = DFExecutor(index, mode="float32", query_cache=cache)

    def filt(term):
        return B(C(O.MUST, T("import")), C(O.FILTER, ir.PrefixQuery(term)))

    ex.matches(filt("de")).count()
    ex.matches(filt("re")).count()
    df_de = cache._entries[query_key(ir.PrefixQuery("de"))]
    # touch "de" so "re" becomes the LRU entry
    ex.matches(filt("de")).count()
    df_re = cache._entries[query_key(ir.PrefixQuery("re"))]
    ex.matches(filt("im")).count()  # evicts "re"
    assert cache.eviction_count == 1 and len(cache) == 2
    assert query_key(ir.PrefixQuery("re")) not in cache._entries
    assert not df_re.is_cached and df_de.is_cached
    cache.clear()
    assert len(cache) == 0 and not df_de.is_cached
