"""MultiPhraseQuery rank identity: oracle vs DataFrame executor vs kernel."""

from __future__ import annotations

import struct

import pytest

from lucene_solr_spark.plans import ir


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


MP = ir.MultiPhraseQuery
QUERIES = {
    "mp_exact": MP((("def", "class"), ("foo", "bar"))),
    "mp_one_alt": MP((("x",), ("y", "z"))),
    "mp_sloppy": MP((("def", "import"), ("foo", "data")), slop=2),
    "mp_three": MP((("def",), ("foo", "bar"), ("baz", "qux")), slop=1),
    # hasMultiTermRpts (round 5): a term shared across slots, one of them
    # multi-term — the union-group machinery runs in all three engines
    "mp_mtp_shared": MP((("def", "import"), ("def",)), slop=2),
    "mp_mtp_both_multi": MP((("for", "in"), ("in", "x")), slop=3),
}


@pytest.fixture(scope="module")
def setup(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
    from lucene_solr_spark.operators.topk import SegmentSearcher
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark
    import tempfile

    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    base = tempfile.mkdtemp(prefix="mpix")
    build_segments(ix, base, segment_size=16)
    return (
        DFExecutor(ix, mode="float32"),
        SegmentSearcher(spark, SegmentIndex.open(base), mode="float32"),
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_multi_phrase_df(name, setup, tiny_oracle):
    q = QUERIES[name]
    dfe, _ = setup
    expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    got = [(r["doc_id"], bits(r["score"])) for r in dfe.topk(q, k=10).collect()]
    assert got == expected, name


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_multi_phrase_kernel(name, setup, tiny_oracle):
    q = QUERIES[name]
    _, searcher = setup
    expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    got = [
        (r["doc_id"], bits(r["score"])) for r in searcher.topk(q, k=10).collect()
    ]
    assert got == expected, name


def test_multi_phrase_subsumes_phrase(setup, tiny_oracle):
    """Single-alternative groups == plain PhraseQuery scores."""
    dfe, _ = setup
    mp = MP((("x",), ("y",)))
    ph = ir.PhraseQuery(("x", "y"))
    a = [(r["doc_id"], bits(r["score"])) for r in dfe.topk(mp, k=10).collect()]
    b = [(r["doc_id"], bits(r["score"])) for r in dfe.topk(ph, k=10).collect()]
    assert a == b
