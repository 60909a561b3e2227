"""END-TO-END RANK IDENTITY: Spark DF executor (float32 mode) vs the
single-node oracle on the tiny corpus — top-k (doc_id, float32 score bits)
must be EXACTLY equal, including HitQueue tie-breaks (CheckHits delta-0
standard, CheckHits.java:329)."""

import struct

import pytest

from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.df_executor import DFExecutor
from lucene_solr_spark.sources.corpus import corpus_to_spark

T = ir.TermQuery
C = ir.BooleanClause
O = ir.Occur


def B(*cs, msm=0):
    return ir.BooleanQuery(tuple(cs), msm)


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


@pytest.fixture(scope="module")
def executor(spark):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=5)
    ix = build_index(corpus).persist()
    return DFExecutor(ix, mode="float32")


QUERIES = {
    "term_head": T("def"),
    "term_mid": T("error"),
    "term_tail": T("obj.method2"),
    "and2": B(C(O.MUST, T("import")), C(O.MUST, T("return"))),
    "and3": B(C(O.MUST, T("def")), C(O.MUST, T("class")), C(O.MUST, T("data"))),
    "or2": B(C(O.SHOULD, T("error")), C(O.SHOULD, T("warning"))),
    "or3": B(C(O.SHOULD, T("merge")), C(O.SHOULD, T("segment")), C(O.SHOULD, T("posting"))),
    "must_not": B(C(O.MUST, T("def")), C(O.MUST_NOT, T("class"))),
    "filter": B(C(O.MUST, T("def")), C(O.FILTER, T("import"))),
    "req_opt": B(C(O.MUST, T("def")), C(O.SHOULD, T("error"))),
    "msm2": B(
        C(O.SHOULD, T("error")),
        C(O.SHOULD, T("warning")),
        C(O.SHOULD, T("fixme")),
        msm=2,
    ),
    "must_msm": B(
        C(O.MUST, T("def")),
        C(O.SHOULD, T("error")),
        C(O.SHOULD, T("warning")),
        msm=1,
    ),
    "boost": B(C(O.SHOULD, ir.BoostQuery(T("error"), 2.0)), C(O.SHOULD, T("warning"))),
    "phrase2": ir.PhraseQuery(("x", "y")),
    "dismax": ir.DisjunctionMaxQuery((T("error"), T("warning")), tie_breaker=0.3),
    "synonym": ir.SynonymQuery(("error", "warning")),
    "prefix": ir.PrefixQuery("ret"),
    "wildcard": ir.WildcardQuery("*dex"),
    "fuzzy": ir.FuzzyQuery("retrn", max_edits=1),
    "range": ir.TermRangeQuery("merge", "query"),
    "term_in_set": ir.TermInSetQuery(("merge", "segment", "posting")),
    "const_score": ir.ConstantScoreQuery(B(C(O.MUST, T("def")), C(O.MUST, T("class")))),
    "match_all": ir.MatchAllDocsQuery(),
    "nested": B(
        C(O.MUST, B(C(O.SHOULD, T("error")), C(O.SHOULD, T("warning")))),
        C(O.MUST, T("def")),
    ),
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_rank_identity(name, executor, tiny_oracle):
    q = QUERIES[name]
    k = 10
    expected = tiny_oracle.search(q, k=k)
    got = executor.topk(q, k=k).collect()
    got_pairs = [(r["doc_id"], bits(r["score"])) for r in got]
    exp_pairs = [(sd.doc_id, bits(sd.score)) for sd in expected]
    assert got_pairs == exp_pairs, (
        f"{name}: got {[(d, hex(b)) for d, b in got_pairs]} "
        f"expected {[(d, hex(b)) for d, b in exp_pairs]}"
    )


@pytest.mark.parametrize("name", ["term_head", "or2", "and2", "msm2"])
def test_total_hits(name, executor, tiny_oracle):
    q = QUERIES[name]
    assert executor.count(q) == tiny_oracle.count(q)


def test_phrase_rank_identity(executor, tiny_oracle):
    # a phrase that actually occurs: comments contain word pairs; find one
    q = ir.PhraseQuery(("public", "static"))
    exp = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    got = [
        (r["doc_id"], bits(r["score"])) for r in executor.topk(q, k=10).collect()
    ]
    assert got == exp


def test_docs_only_rank_identity(spark):
    """IndexOptions.DOCS: tf=1 scoring + uniqueTermCount norms
    (BM25Similarity.java:139-141) — engine vs oracle bit equality."""
    from lucene_solr_spark.oracle.engine import OracleIndex
    from lucene_solr_spark.sources.corpus import corpus_to_spark, make_corpus_rows

    rows = make_corpus_rows(80, seed=5)
    oracle = OracleIndex(
        ((i, r["content"]) for i, r in enumerate(rows)), index_options="docs"
    )
    corpus = corpus_to_spark(spark, 80, seed=5, num_partitions=3)
    ix = build_index(corpus, index_options="docs").persist()
    ex = DFExecutor(ix, mode="float32")
    for q in (T("def"), B(C(O.SHOULD, T("error")), C(O.SHOULD, T("warning")))):
        expected = [(sd.doc_id, bits(sd.score)) for sd in oracle.search(q, k=10)]
        got = [
            (r["doc_id"], bits(r["score"])) for r in ex.topk(q, k=10).collect()
        ]
        assert got == expected
