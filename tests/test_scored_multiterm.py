"""Scored prefix/wildcard — SCORING_BOOLEAN_REWRITE parity
(``search/ScoringRewrite.java:67-74`` addClause, ``MultiTermQuery.java:40``
TooManyClauses, ``search/MultiTermQuery.java:92-103``)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lucene_solr_spark.oracle import bm25
from lucene_solr_spark.plans import ir


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def test_oracle_scored_prefix_is_per_term_df(tiny_oracle):
    """Each expansion term scores with its OWN df (no blending), clause
    fold in term-sorted order, double accumulator, f32 final."""
    q = ir.PrefixQuery("se", constant_score=False)
    got = tiny_oracle.matches(q)
    expanded = sorted(t for t in tiny_oracle.dictionary() if t.startswith("se"))
    assert expanded, "corpus should contain se* terms"
    acc: dict[int, float] = {}
    for t in expanded:
        df = len(tiny_oracle.postings[t])
        w = bm25.term_weight(1.0, bm25.idf(df, tiny_oracle.doc_count))
        for d, tf in tiny_oracle.postings[t].items():
            s = bm25.score(tf, tiny_oracle.norms[d], weight=w, cache=tiny_oracle.cache)[()]
            acc[d] = acc.get(d, 0.0) + float(s)
    want = {d: bits(np.float32(v)) for d, v in acc.items()}
    assert {d: bits(s) for d, s in got.items()} == want


def test_scored_differs_from_blended_when_dfs_differ(tiny_oracle):
    """With unequal per-term dfs the scoring rewrite must NOT equal a
    blended-df rewrite — guards against routing through the fuzzy path."""
    q = ir.PrefixQuery("se", constant_score=False)
    expanded = sorted(t for t in tiny_oracle.dictionary() if t.startswith("se"))
    dfs = {len(tiny_oracle.postings[t]) for t in expanded}
    if len(dfs) < 2:
        pytest.skip("corpus dfs collide; nothing to distinguish")
    got = tiny_oracle.matches(q)
    df_blend = max(len(tiny_oracle.postings[t]) for t in expanded)
    blended: dict[int, float] = {}
    for t in expanded:
        w = bm25.term_weight(1.0, bm25.idf(df_blend, tiny_oracle.doc_count))
        for d, tf in tiny_oracle.postings[t].items():
            s = bm25.score(tf, tiny_oracle.norms[d], weight=w, cache=tiny_oracle.cache)[()]
            blended[d] = blended.get(d, 0.0) + float(s)
    assert {d: bits(s) for d, s in got.items()} != {
        d: bits(np.float32(v)) for d, v in blended.items()
    }


def test_too_many_clauses(tiny_oracle, monkeypatch):
    monkeypatch.setattr(ir, "MAX_CLAUSE_COUNT", 1)
    with pytest.raises(ir.TooManyClauses):
        tiny_oracle.matches(ir.PrefixQuery("se", constant_score=False))


def test_empty_expansion_is_empty(tiny_oracle):
    assert tiny_oracle.matches(ir.PrefixQuery("zzzq", constant_score=False)) == {}


@pytest.mark.parametrize(
    "q",
    [
        ir.PrefixQuery("se", constant_score=False),
        ir.WildcardQuery("s*f", constant_score=False),
        ir.RegexpQuery("[sd].*f", constant_score=False),
    ],
)
def test_df_executor_rank_identity(spark, tiny_corpus_rows, tiny_oracle, q):
    """float32 DF-executor scored multi-term == single-node oracle,
    bit-exact."""
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    corpus = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id long, content string",
    )
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="float32")
    got = {r["doc_id"]: bits(r["score"]) for r in ex.matches(q).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(q).items()}
    assert got == want and got


def test_constant_score_default_unchanged(tiny_oracle):
    got = tiny_oracle.matches(ir.PrefixQuery("se"))
    assert got and all(float(s) == 1.0 for s in got.values())


def test_top_terms_variant_truncates_not_errors(tiny_oracle, monkeypatch):
    """TOP_TERMS_SCORING_BOOLEAN_REWRITE(N): keeps the N smallest terms
    (constant-boost PQ order, TopTermsRewrite.java:210-213) instead of
    raising TooManyClauses."""
    monkeypatch.setattr(ir, "MAX_CLAUSE_COUNT", 1)
    q = ir.PrefixQuery("se", constant_score=False, max_expansions=1)
    got = tiny_oracle.matches(q)
    first = sorted(t for t in tiny_oracle.dictionary() if t.startswith("se"))[0]
    want = {
        d: bits(s) for d, s in tiny_oracle._term_scores(first, 1.0).items()
    }
    assert {d: bits(s) for d, s in got.items()} == {
        d: bits(np.float32(float(s))) for d, s in want.items()
    } or {d: bits(s) for d, s in got.items()} == want


def test_top_terms_df_executor_matches_oracle(spark, tiny_corpus_rows, tiny_oracle):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    corpus = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id long, content string",
    )
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="float32")
    q = ir.PrefixQuery("s", constant_score=False, max_expansions=3)
    got = {r["doc_id"]: bits(r["score"]) for r in ex.matches(q).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(q).items()}
    assert got == want and got


def test_kernel_scored_prefix_rank_identity(spark, tiny_corpus_rows, tiny_oracle, tmp_path):
    """Block-kernel executor scored prefix == single-node oracle,
    bit-exact (the np.add.at disjunction folds clauses in term-sorted
    order, matching the oracle's left fold)."""
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
    from lucene_solr_spark.operators.topk import SegmentSearcher

    corpus = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id long, content string",
    )
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    base = str(tmp_path / "seg")
    build_segments(ix, base, segment_size=32)
    searcher = SegmentSearcher(spark, SegmentIndex.open(base), mode="float32")
    q = ir.PrefixQuery("se", constant_score=False)
    got = {r["doc_id"]: bits(r["score"]) for r in searcher.matches(q).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(q).items()}
    assert got == want and got

    # round 5: the kernel SERVES scored fuzzy now (BlendedTermQuery
    # lowering) instead of raising — full parity in test_scored_fuzzy.py
    fq = ir.FuzzyQuery("for", constant_score=False)
    got_f = {
        r["doc_id"]: bits(r["score"]) for r in searcher.matches(fq).collect()
    }
    want_f = {d: bits(s) for d, s in tiny_oracle.matches(fq).items()}
    assert got_f == want_f and got_f
