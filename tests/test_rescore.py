"""QueryRescorer (reference: lucene/core search/QueryRescorer.java):
rescored ranking == manual firstPass + weight * secondPass recombination,
non-matching hits keep their first-pass score, and weight=0 is the
identity re-rank of the first-pass top-k."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.plans import ir

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def executor(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ix = build_index(docs, text_col="text", doc_id_col="doc_id").persist()
    return DFExecutor(ix, mode="double")


FIRST = ir.TermQuery("table")
SECOND = ir.PhraseQuery(("table", "scan"))


def _manual(ex, weight, k):
    s1 = {r["doc_id"]: r["score"] for r in ex.topk(FIRST, k=50).collect()}
    s2 = {r["doc_id"]: r["score"] for r in ex.matches(SECOND).collect()}
    comb = [(d, v + weight * s2.get(d, 0.0)) for d, v in s1.items()]
    comb.sort(key=lambda t: (-t[1], t[0]))
    return comb[:k]


@pytest.mark.parametrize("weight", [2.0, 0.5])
def test_rescore_matches_manual_combine(executor, weight):
    first = executor.topk(FIRST, k=50).select("doc_id", "score")
    got = [
        (r["doc_id"], r["score"])
        for r in executor.rescore(first, SECOND, weight=weight, k=10).collect()
    ]
    want = _manual(executor, weight, 10)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert np.allclose([s for _, s in got], [s for _, s in want], rtol=0, atol=0)


def test_rescore_weight_zero_is_identity(executor):
    first = executor.topk(FIRST, k=50).select("doc_id", "score")
    got = executor.rescore(first, SECOND, weight=0.0, k=10).collect()
    base = executor.topk(FIRST, k=10).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in base]
    assert [r["score"] for r in got] == [r["score"] for r in base]


@pytest.mark.parametrize("weight", [2.0, 0.3])
def test_facade_rescore_float32(spark, tmp_path_factory, weight):
    """SearchEngine.rescore == manual recombination of the page with the
    reference static helper's semantics (``QueryRescorer.java:184-188``):
    comb = f32(double(s1) + weight * double(s2)) — double accumulate, ONE
    final float rounding (weight=0.3 exercises the non-power-of-two case
    where per-operation rounding would differ)."""
    import struct

    from lucene_solr_spark.api import SearchEngine
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    def f32(x):
        return struct.unpack("<f", struct.pack("<f", x))[0]

    base = str(tmp_path_factory.mktemp("rescx"))
    eng = SearchEngine.index_corpus(
        spark, corpus_to_spark(spark, 100, seed=42, num_partitions=4),
        base, segment_size=32,
    )
    page = eng.search("def", k=30)
    got = eng.rescore(page, '"x y"', weight=weight, k=10)
    s2 = {h.doc_id: h.score for h in eng.search('"x y"', k=100)}
    want = sorted(
        (
            (h.doc_id, f32(h.score + weight * s2.get(h.doc_id, 0.0)))
            for h in page
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(h.doc_id, h.score) for h in got] == want


def test_rescore_keeps_nonmatching_hits(executor):
    """Hits outside the second query's match set survive with s1 intact."""
    first = executor.topk(FIRST, k=50).select("doc_id", "score")
    res = {
        r["doc_id"]: r["score"]
        for r in executor.rescore(first, SECOND, weight=2.0, k=50).collect()
    }
    s1 = {r["doc_id"]: r["score"] for r in executor.topk(FIRST, k=50).collect()}
    s2_docs = {r["doc_id"] for r in executor.matches(SECOND).collect()}
    untouched = [d for d in s1 if d not in s2_docs]
    assert untouched, "fixture must include non-phrase hits"
    for d in untouched:
        assert res[d] == s1[d]
