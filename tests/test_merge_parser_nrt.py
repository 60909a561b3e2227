"""TieredMergePolicy + merge job, query parser, and streaming NRT tests."""

from __future__ import annotations

import struct

import pytest

from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.operators.merge_policy import (
    TieredMergePolicy,
    find_merges,
    merge_segments,
)
from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
from lucene_solr_spark.operators.topk import SegmentSearcher
from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.parser import parse_query
from lucene_solr_spark.sources.corpus import corpus_to_spark, make_corpus_rows

T = ir.TermQuery
C = ir.BooleanClause
O = ir.Occur


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


# ------------------------------------------------------------ merge policy
def test_find_merges_respects_tiers():
    policy = TieredMergePolicy(
        segs_per_tier=4, max_merge_at_once=4, floor_segment_bytes=10,
        max_merged_segment_bytes=10_000,
    )
    segs = [
        {"segment_id": i, "n_postings": 0, "size_bytes": 100} for i in range(12)
    ]
    merges = find_merges(segs, policy)
    assert merges, "12 equal segments over a 4-per-tier budget must merge"
    for m in merges:
        assert 2 <= len(m) <= 4
    # no segment merged twice
    flat = [i for m in merges for i in m]
    assert len(flat) == len(set(flat))


def test_find_merges_max_size_cap():
    policy = TieredMergePolicy(
        segs_per_tier=2, max_merge_at_once=10, floor_segment_bytes=1,
        max_merged_segment_bytes=250,
    )
    segs = [
        {"segment_id": i, "n_postings": 0, "size_bytes": 100} for i in range(8)
    ]
    for m in find_merges(segs, policy):
        assert len(m) * 100 <= 250 or len(m) == 2


def test_find_merges_prefers_balanced():
    """Skew term: merging equal-size segments scores lower (better) than a
    merge dominated by one big segment (TieredMergePolicy.java:678-686)."""
    policy = TieredMergePolicy(
        segs_per_tier=1, max_merge_at_once=2, floor_segment_bytes=1000,
        max_merged_segment_bytes=10**9,
    )
    segs = [
        {"segment_id": 0, "n_postings": 0, "size_bytes": 1000},
        {"segment_id": 1, "n_postings": 0, "size_bytes": 100},
        {"segment_id": 2, "n_postings": 0, "size_bytes": 100},
    ]
    merges = find_merges(segs, policy)
    assert merges and set(merges[0]) == {1, 2}


@pytest.fixture(scope="module")
def merged_base(spark, tmp_path_factory):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    base = str(tmp_path_factory.mktemp("mergeix"))
    build_segments(ix, base, segment_size=8)  # 13 small segments
    return base


def test_merge_preserves_rank_identity(spark, merged_base, tiny_oracle):
    six = SegmentIndex.open(merged_base)
    n_before = len(six.manifest()["segments"])
    policy = TieredMergePolicy(
        segs_per_tier=3, max_merge_at_once=5, floor_segment_bytes=1,
        max_merged_segment_bytes=10**9,
    )
    merges = find_merges(six.manifest()["segments"], policy)
    assert merges
    merge_segments(spark, six, merges[0])
    m_after = SegmentIndex.open(merged_base).manifest()
    assert len(m_after["segments"]) == n_before - len(merges[0]) + 1
    assert sum(s["n_docs"] for s in m_after["segments"]) == 100

    searcher = SegmentSearcher(
        spark, SegmentIndex.open(merged_base), mode="float32"
    )
    for q in (
        T("def"),
        ir.BooleanQuery(
            (C(O.SHOULD, T("error")), C(O.SHOULD, T("warning"))), 0
        ),
        ir.PhraseQuery(("x", "y")),
    ):
        expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
        got = [
            (r["doc_id"], bits(r["score"]))
            for r in searcher.topk(q, k=10).collect()
        ]
        assert got == expected


# ----------------------------------------------------------------- parser
@pytest.mark.parametrize(
    "s,expected",
    [
        ("merge", T("merge")),
        ("Merge", T("merge")),
        (
            "merge window",
            ir.BooleanQuery(
                (C(O.SHOULD, T("merge")), C(O.SHOULD, T("window"))), 0
            ),
        ),
        (
            "+merge +window",
            ir.BooleanQuery((C(O.MUST, T("merge")), C(O.MUST, T("window"))), 0),
        ),
        (
            "merge AND window",
            ir.BooleanQuery((C(O.MUST, T("merge")), C(O.MUST, T("window"))), 0),
        ),
        (
            "merge OR window",
            ir.BooleanQuery(
                (C(O.SHOULD, T("merge")), C(O.SHOULD, T("window"))), 0
            ),
        ),
        (
            "+scan -filter",
            ir.BooleanQuery(
                (C(O.MUST, T("scan")), C(O.MUST_NOT, T("filter"))), 0
            ),
        ),
        ('"table scan"', ir.PhraseQuery(("table", "scan"))),
        ('"table scan"~2', ir.PhraseQuery(("table", "scan"), slop=2)),
        ("seg*", ir.PrefixQuery("seg")),
        ("s?g*", ir.WildcardQuery("s?g*")),
        ("mrge~1", ir.FuzzyQuery("mrge", max_edits=1)),
        ("[merge TO query]", ir.TermRangeQuery("merge", "query", True, True)),
        ("merge^2", ir.BoostQuery(T("merge"), 2.0)),
        ("Can't", T("can't")),
    ],
)
def test_parse_query(s, expected):
    assert parse_query(s) == expected


def test_parse_group():
    q = parse_query("+(error warning) +def")
    assert isinstance(q, ir.BooleanQuery)
    musts = q.by_occur(O.MUST)
    assert len(musts) == 2
    assert T("def") in musts


def test_parse_vs_engine(spark, tiny_oracle):
    """Parsed text queries produce the same results as hand-built IR."""
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    from lucene_solr_spark.plans.df_executor import DFExecutor

    ex = DFExecutor(ix, mode="float32")
    q = parse_query("+def +class")
    expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    got = [
        (r["doc_id"], bits(r["score"])) for r in ex.topk(q, k=10).collect()
    ]
    assert got == expected


# ------------------------------------------------------------------- NRT
def test_nrt_two_batches_then_search(spark, tmp_path_factory):
    """Two foreachBatch-style appends → manifest grows, searches score with
    refreshed global stats, rank-identical to an oracle over the same
    arrival order."""
    from lucene_solr_spark.oracle.engine import OracleIndex
    from lucene_solr_spark.streaming.nrt import append_batch

    rows = make_corpus_rows(60, seed=7)
    base = str(tmp_path_factory.mktemp("nrt"))
    df_all = corpus_to_spark(spark, 60, seed=7, num_partitions=3)
    batch1 = df_all.limit(0).unionByName(
        spark.createDataFrame(rows[:40], df_all.schema)
    )
    batch2 = spark.createDataFrame(rows[40:], df_all.schema)

    s1 = append_batch(batch1, base)
    six = SegmentIndex.open(base)
    assert six.doc_count == 40
    s2 = append_batch(batch2, base)
    assert s2 == s1 + 1
    six = SegmentIndex.open(base)
    assert six.doc_count == 60
    assert len(six.manifest()["segments"]) == 2

    # oracle with identical arrival order (rows pre-sorted per batch)
    oracle = OracleIndex(
        (i, r["content"]) for i, r in enumerate(rows)
    )
    searcher = SegmentSearcher(spark, six, mode="float32")
    for q in (T("def"), T("error")):
        expected = [(sd.doc_id, bits(sd.score)) for sd in oracle.search(q, k=10)]
        got = [
            (r["doc_id"], bits(r["score"]))
            for r in searcher.topk(q, k=10).collect()
        ]
        assert got == expected


def test_nrt_batch_replay_is_idempotent(spark, tmp_path_factory):
    """foreachBatch is at-least-once: a replayed batch_id must be a no-op,
    not a duplicate segment with fresh doc_ids (ADVICE r1)."""
    from lucene_solr_spark.streaming.nrt import append_batch

    rows = make_corpus_rows(30, seed=11)
    base = str(tmp_path_factory.mktemp("nrt_replay"))
    df_all = corpus_to_spark(spark, 30, seed=11, num_partitions=2)
    b1 = spark.createDataFrame(rows[:20], df_all.schema)
    b2 = spark.createDataFrame(rows[20:], df_all.schema)
    assert append_batch(b1, base, batch_id=0) is not None
    assert append_batch(b1, base, batch_id=0) is None  # replay -> no-op
    m = SegmentIndex.open(base).manifest()
    assert m["doc_count"] == 20 and len(m["segments"]) == 1
    assert append_batch(b2, base, batch_id=1) is not None
    assert append_batch(b2, base, batch_id=1) is None
    m = SegmentIndex.open(base).manifest()
    assert m["doc_count"] == 30 and m["last_batch_id"] == 1
    assert len(m["segments"]) == 2


def test_phrase_on_positionless_index_raises(spark, tmp_path_factory):
    """Clear error (reference: IllegalStateException 'field was indexed
    without position data') instead of an opaque TypeError when a phrase
    runs against an index built with index_options='freqs' (ADVICE r1)."""
    corpus = corpus_to_spark(spark, 40, seed=3, num_partitions=2)
    ix = build_index(corpus, index_options="freqs").persist()
    base = str(tmp_path_factory.mktemp("nopos"))
    build_segments(ix, base, segment_size=16)
    searcher = SegmentSearcher(spark, SegmentIndex.open(base), mode="float32")
    with pytest.raises(Exception) as ei:
        searcher.topk(ir.PhraseQuery(("x", "y")), k=5).collect()
    assert "without positions" in str(ei.value)


def test_nrt_streaming_end_to_end(spark, tmp_path_factory):
    """Real Structured Streaming: file source → index_stream(availableNow)
    → searchable SegmentIndex."""
    from lucene_solr_spark.streaming.nrt import index_stream

    src = tmp_path_factory.mktemp("stream_src")
    base = str(tmp_path_factory.mktemp("nrt_stream"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    df_all = corpus_to_spark(spark, 30, seed=9, num_partitions=1)
    df_all.write.mode("overwrite").parquet(str(src / "files"))

    stream = spark.readStream.schema(df_all.schema).parquet(str(src / "files"))
    q = index_stream(stream, base, ckpt, trigger_once=True)
    q.awaitTermination(120)
    six = SegmentIndex.open(base)
    assert six.doc_count == 30
    searcher = SegmentSearcher(spark, six, mode="float32")
    assert searcher.topk(T("def"), k=5).count() > 0


def test_concurrent_merges_identical_results(
    spark, tmp_path_factory, tiny_oracle, monkeypatch
):
    """ConcurrentMergeScheduler contract: two disjoint merges run their
    build phases as CONCURRENT Spark jobs (distinct driver threads,
    overlapping wall intervals), and post-merge search is rank-identical
    to the single-node oracle."""
    import threading
    import time

    import lucene_solr_spark.operators.merge_policy as mp
    from lucene_solr_spark.operators.merge_policy import run_merges

    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    base = str(tmp_path_factory.mktemp("cmix"))
    build_segments(ix, base, segment_size=8)
    six = SegmentIndex.open(base)
    policy = TieredMergePolicy(
        segs_per_tier=2, max_merge_at_once=3, floor_segment_bytes=1,
        max_merged_segment_bytes=10**9,
    )
    assert len(find_merges(six.manifest()["segments"], policy)) >= 2

    spans: list[tuple[float, float, int]] = []
    orig = mp._build_merged_segment

    def spy(spark_, index_, manifest_, child_ids_, new_id_):
        t0 = time.monotonic()
        r = orig(spark_, index_, manifest_, child_ids_, new_id_)
        spans.append((t0, time.monotonic(), threading.get_ident()))
        return r

    monkeypatch.setattr(mp, "_build_merged_segment", spy)
    new_ids = run_merges(spark, six, policy)
    assert len(new_ids) == len(spans) >= 2
    # distinct threads, overlapping wall intervals = concurrent jobs
    assert len({tid for _a, _b, tid in spans}) >= 2
    (a0, a1, _), (b0, b1, _) = spans[:2]
    assert max(a0, b0) < min(a1, b1), "build phases did not overlap"

    m = SegmentIndex.open(base).manifest()
    assert sum(s["n_docs"] for s in m["segments"]) == 100
    assert {s["segment_id"] for s in m["segments"]} >= set(new_ids)

    searcher = SegmentSearcher(spark, SegmentIndex.open(base), mode="float32")
    for q in (
        T("def"),
        ir.BooleanQuery(
            (C(O.SHOULD, T("error")), C(O.SHOULD, T("warning"))), 0
        ),
        ir.PhraseQuery(("x", "y")),
    ):
        expected = [
            (sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)
        ]
        got = [
            (r["doc_id"], bits(r["score"]))
            for r in searcher.topk(q, k=10).collect()
        ]
        assert got == expected
