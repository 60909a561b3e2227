"""MoreLikeThis + CommonTermsQuery (reference: lucene/queries —
mlt/MoreLikeThis.java, CommonTermsQuery.java)."""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.functions.mlt import (
    common_terms_query,
    interesting_terms,
    mlt_query,
    mlt_topk,
)
from lucene_solr_spark.plans import ir

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def executor(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ix = build_index(docs, text_col="text", doc_id_col="doc_id").persist()
    return DFExecutor(ix, mode="double")


# ------------------------------------------------------------ MoreLikeThis
def test_interesting_terms_filters_and_order(executor):
    ix = executor.index
    sel = interesting_terms(ix, 7, min_term_freq=2, min_doc_freq=5)
    assert sel, "doc 7 should yield interesting terms"
    n = ix.doc_count
    # recompute each candidate's score by hand; verify filters + ordering
    prev = None
    for term, score, tf, df in sel:
        assert tf >= 2 and df >= 5
        expect = tf * (math.log((n + 1) / (df + 1.0)) + 1.0)
        assert score == expect
        key = (-score, term)
        if prev is not None:
            assert prev <= key, "must be sorted by (score desc, term asc)"
        prev = key


def test_interesting_terms_respects_limit_and_stopwords(executor):
    ix = executor.index
    full = interesting_terms(ix, 7, min_term_freq=1, min_doc_freq=1)
    top3 = interesting_terms(ix, 7, min_term_freq=1, min_doc_freq=1, max_query_terms=3)
    assert [t for t, *_ in top3] == [t for t, *_ in full[:3]]
    banned = frozenset(t for t, *_ in full[:2])
    without = interesting_terms(
        ix, 7, min_term_freq=1, min_doc_freq=1, stopwords=banned
    )
    assert banned.isdisjoint({t for t, *_ in without})


def test_mlt_query_shape(executor):
    q = mlt_query(executor.index, 7, min_term_freq=2, min_doc_freq=5)
    assert isinstance(q, ir.BooleanQuery)
    assert all(c.occur == ir.Occur.SHOULD for c in q.clauses)
    qb = mlt_query(executor.index, 7, boost=True, min_term_freq=2, min_doc_freq=5)
    boosts = [c.query.boost for c in qb.clauses if isinstance(c.query, ir.BoostQuery)]
    assert boosts and max(boosts) == pytest.approx(1.0)
    assert all(0 < b <= 1.0 for b in boosts)


def test_mlt_topk_matches_generic_boolean_path(executor):
    """The single-scan disjunction must rank exactly like the generic
    SHOULD-boolean evaluation of the same query (leaf-f32 rounding only
    perturbs scores below any inter-doc gap here)."""
    fast = mlt_topk(executor, 7, k=10, min_term_freq=2, min_doc_freq=5)
    q = mlt_query(executor.index, 7, min_term_freq=2, min_doc_freq=5)
    slow = executor.topk(q, k=10)
    f = fast.collect()
    s = slow.collect()
    assert [r["doc_id"] for r in f] == [r["doc_id"] for r in s]
    for rf, rs in zip(f, s):
        assert rf["score"] == pytest.approx(rs["score"], rel=1e-6)


def test_mlt_empty_when_no_terms_survive(executor):
    out = mlt_topk(executor, 7, k=10, min_term_freq=10**6)
    assert out.count() == 0


# -------------------------------------------------------- CommonTermsQuery
def _df_of(table):
    return lambda t: table.get(t, 0)


def test_common_terms_split_and_shape():
    dfs = {"rare1": 3, "rare2": 7, "common": 900}
    q = common_terms_query(
        ("rare1", "common", "rare2"), _df_of(dfs), 1000, max_term_frequency=0.5
    )
    # cutoff = ceil(0.5*1000) = 500: common → high, rare* (+unknown) → low
    assert isinstance(q, ir.BooleanQuery)
    must = [c for c in q.clauses if c.occur == ir.Occur.MUST]
    should = [c for c in q.clauses if c.occur == ir.Occur.SHOULD]
    assert len(must) == 1 and len(should) == 1
    low = must[0].query.query  # BoostQuery → BooleanQuery
    high = should[0].query.query
    assert {c.query.term for c in low.clauses} == {"rare1", "rare2"}
    assert {c.query.term for c in high.clauses} == {"common"}


def test_common_terms_unknown_term_goes_low():
    q = common_terms_query(
        ("missing", "common"), _df_of({"common": 900}), 1000, max_term_frequency=0.5
    )
    must = [c for c in q.clauses if c.occur == ir.Occur.MUST]
    low = must[0].query.query
    assert {c.query.term for c in low.clauses} == {"missing"}


def test_common_terms_high_only_hardens_to_must():
    dfs = {"a": 900, "b": 950}
    q = common_terms_query(("a", "b"), _df_of(dfs), 1000, max_term_frequency=0.5)
    # no low-freq terms → high group becomes a MUST conjunction
    assert isinstance(q, ir.BoostQuery)
    inner = q.query
    assert all(c.occur == ir.Occur.MUST for c in inner.clauses)


def test_common_terms_msm_rounding():
    dfs = {"a": 1, "b": 2, "c": 3, "common": 900}
    q = common_terms_query(
        ("a", "b", "c", "common"),
        _df_of(dfs),
        1000,
        max_term_frequency=0.5,
        low_freq_min_should_match=0.5,
    )
    must = [c for c in q.clauses if c.occur == ir.Occur.MUST]
    low = must[0].query.query
    assert low.min_should_match == 2  # Math.round(0.5 * 3)


def test_common_terms_absolute_cutoff():
    dfs = {"a": 5, "b": 20}
    q = common_terms_query(("a", "b"), _df_of(dfs), 1000, max_term_frequency=10.0)
    must = [c for c in q.clauses if c.occur == ir.Occur.MUST]
    should = [c for c in q.clauses if c.occur == ir.Occur.SHOULD]
    low = must[0].query.query
    high = should[0].query.query
    assert {c.query.term for c in low.clauses} == {"a"}
    assert {c.query.term for c in high.clauses} == {"b"}
