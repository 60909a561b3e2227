"""searchAfter paging + totalHitsThreshold (search/IndexSearcher.java:470,
:97; TopScoreDocCollector.java:320).

The invariant under test: paging with the (score, doc_id) cursor must
reproduce EXACTLY the suffix of the unpaged ranking — on both executors,
float32 bits included — because the collector tie-break (score desc,
doc_id asc) makes the cursor a total order.
"""

from __future__ import annotations

import struct

import pytest

from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
from lucene_solr_spark.operators.topk import SegmentSearcher
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


QUERIES = [
    T("def"),
    B(C(O.SHOULD, T("error")), C(O.SHOULD, T("warning"))),
    B(C(O.MUST, T("import")), C(O.SHOULD, T("return"))),
]


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=5)
    ix = build_index(corpus).persist()
    base = str(tmp_path_factory.mktemp("pagix"))
    build_segments(ix, base, segment_size=16)
    return SegmentSearcher(spark, SegmentIndex.open(base), mode="float32")


@pytest.fixture(scope="module")
def df_exec(spark):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=5)
    return DFExecutor(build_index(corpus).persist(), mode="float32")


def _rows(df):
    return [(r["doc_id"], bits(r["score"])) for r in df.collect()]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_kernel_paging_equals_suffix(qi, searcher):
    q = QUERIES[qi]
    full = _rows(searcher.topk(q, k=30))
    assert len(full) > 10, "query must match enough docs to page"
    page1 = full[:10]
    s, d = None, None
    # cursor from the collected page-1 tail (as a client would hold it)
    r10 = searcher.topk(q, k=10).collect()[-1]
    s, d = float(r10["score"]), int(r10["doc_id"])
    page2 = _rows(searcher.topk(q, k=10, after=(s, d)))
    assert page2 == full[10:20]
    # page 3 via page-2's cursor
    r20 = searcher.topk(q, k=10, after=(s, d)).collect()[-1]
    page3 = _rows(searcher.topk(q, k=10, after=(float(r20["score"]), int(r20["doc_id"]))))
    assert page3 == full[20:30]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_df_paging_equals_suffix(qi, df_exec):
    q = QUERIES[qi]
    full = _rows(df_exec.topk(q, k=30))
    assert len(full) > 10
    r10 = df_exec.topk(q, k=10).collect()[-1]
    page2 = _rows(df_exec.topk(q, k=10, after=(float(r10["score"]), int(r10["doc_id"]))))
    assert page2 == full[10:20]


def test_kernel_cursor_splits_score_ties(searcher):
    """Walk page-by-page with k=1: every step must advance exactly one row
    of the full ranking even through runs of identical float32 scores."""
    q = QUERIES[0]
    full = _rows(searcher.topk(q, k=15))
    cur = None
    walked = []
    for _ in range(15):
        row = searcher.topk(q, k=1, after=cur).collect()
        if not row:
            break
        r = row[0]
        walked.append((r["doc_id"], bits(r["score"])))
        cur = (float(r["score"]), int(r["doc_id"]))
    assert walked == full


def test_facade_search_after_and_total_hits(spark, tmp_path_factory):
    from lucene_solr_spark.api import SearchEngine

    base = str(tmp_path_factory.mktemp("facade_page"))
    eng = SearchEngine.index_corpus(
        spark, corpus_to_spark(spark, 100, seed=42), base, segment_size=32
    )
    full = eng.search("def", k=20)
    page1 = eng.search("def", k=10)
    page2 = eng.search("def", k=10, after=page1[-1])
    assert page1 + page2 == full

    td = eng.search_top("def", k=5, total_hits_threshold=1000)
    assert td.relation == "eq"
    assert td.total_hits == eng.count("def")
    assert [h.doc_id for h in td.hits] == [h.doc_id for h in full[:5]]

    td2 = eng.search_top("def", k=5, total_hits_threshold=3)
    assert td2.relation == "gte"
    assert td2.total_hits >= 4  # lower bound past the threshold
    assert td2.total_hits <= eng.count("def")
