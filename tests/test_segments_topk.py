"""Segment layer + kernel searcher tests.

(a) rank identity: SegmentSearcher (float32, exhaustive) vs the single-node
    oracle — exact (doc_id, float32 bits) top-k equality;
(b) block-max pruned mode ≡ exhaustive mode (pruning must never change
    results — the WANDScorer soundness contract);
(c) segment build determinism / manifest lineage / resume idempotency.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
from lucene_solr_spark.operators.topk import SegmentSearcher
from lucene_solr_spark.plans import ir
from lucene_solr_spark.sources.corpus import corpus_to_spark

T = ir.TermQuery
C = ir.BooleanClause
O = ir.Occur


def B(*cs, msm=0):
    return ir.BooleanQuery(tuple(cs), msm)


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


KERNEL_QUERIES = {
    "term_head": T("def"),
    "term_mid": T("error"),
    "term_tail": T("obj.method2"),
    "and2": B(C(O.MUST, T("import")), C(O.MUST, T("return"))),
    "and3": B(C(O.MUST, T("def")), C(O.MUST, T("class")), C(O.MUST, T("data"))),
    "or2": B(C(O.SHOULD, T("error")), C(O.SHOULD, T("warning"))),
    "or3": B(
        C(O.SHOULD, T("merge")), C(O.SHOULD, T("segment")), C(O.SHOULD, T("posting"))
    ),
    "must_not": B(C(O.MUST, T("def")), C(O.MUST_NOT, T("class"))),
    "filter": B(C(O.MUST, T("def")), C(O.FILTER, T("import"))),
    "req_opt": B(C(O.MUST, T("def")), C(O.SHOULD, T("error"))),
    "msm2": B(
        C(O.SHOULD, T("error")),
        C(O.SHOULD, T("warning")),
        C(O.SHOULD, T("fixme")),
        msm=2,
    ),
    "boost": B(
        C(O.SHOULD, ir.BoostQuery(T("error"), 2.0)), C(O.SHOULD, T("warning"))
    ),
    "dismax": ir.DisjunctionMaxQuery((T("error"), T("warning")), tie_breaker=0.3),
    "synonym": ir.SynonymQuery(("error", "warning")),
    "prefix": ir.PrefixQuery("ret"),
    "range": ir.TermRangeQuery("merge", "query"),
    "wildcard": ir.WildcardQuery("s?an*"),
    "regexp": ir.RegexpQuery("s.an.*"),
    "fuzzy": ir.FuzzyQuery("scon", max_edits=1),
    # > 1024 matching terms: the kernel must evaluate this per segment
    # (dict_pred) — there is no driver-side term collection to overflow
    "wide_range": ir.TermRangeQuery("0", "zzzz"),
    "term_in_set": ir.TermInSetQuery(("merge", "segment", "posting")),
    "const_score": ir.ConstantScoreQuery(
        B(C(O.MUST, T("def")), C(O.MUST, T("class")))
    ),
    "match_all": ir.MatchAllDocsQuery(),
    "phrase2": ir.PhraseQuery(("x", "y")),
    "phrase3": ir.PhraseQuery(("def", "foo")),
    "sloppy2": ir.PhraseQuery(("x", "y"), slop=2),
    "phrase_and_term": B(
        C(O.MUST, ir.PhraseQuery(("x", "y"))), C(O.MUST, T("def"))
    ),
    "phrase_or_term": B(
        C(O.SHOULD, ir.PhraseQuery(("table", "scan"))), C(O.SHOULD, T("merge"))
    ),
    "req_opt_phrase": B(
        C(O.MUST, T("def")), C(O.SHOULD, ir.PhraseQuery(("x", "y"), slop=1))
    ),
    "nested": B(
        C(O.MUST, B(C(O.SHOULD, T("error")), C(O.SHOULD, T("warning")))),
        C(O.MUST, T("def")),
    ),
}


@pytest.fixture(scope="module")
def seg_base(spark, tmp_path_factory):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=5)
    ix = build_index(corpus).persist()
    base = str(tmp_path_factory.mktemp("segix"))
    # small segment_size so the tiny corpus spans multiple segments
    build_segments(ix, base, segment_size=16)
    return base


@pytest.fixture(scope="module")
def searcher(spark, seg_base):
    return SegmentSearcher(spark, SegmentIndex.open(seg_base), mode="float32")


@pytest.mark.parametrize("name", sorted(KERNEL_QUERIES))
def test_kernel_rank_identity(name, searcher, tiny_oracle):
    q = KERNEL_QUERIES[name]
    expected = tiny_oracle.search(q, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in searcher.topk(q, k=10).collect()
    ]
    exp = [(sd.doc_id, bits(sd.score)) for sd in expected]
    assert [(d, bits(s)) for d, s in got] == exp, f"{name}: {got} != {expected}"


@pytest.mark.parametrize(
    "name",
    [
        "term_head", "term_mid", "and2", "and3", "or2", "or3",
        # generalized kernel (Boolean2ScorerSupplier table): phrases as
        # components + mixed MUST+SHOULD (ReqOptSum) are pruned too
        "phrase2", "phrase3", "sloppy2", "req_opt",
        "phrase_and_term", "phrase_or_term", "req_opt_phrase", "boost",
    ],
)
def test_blockmax_equals_exhaustive(name, spark, seg_base, tiny_oracle):
    q = KERNEL_QUERIES[name]
    ex = SegmentSearcher(spark, SegmentIndex.open(seg_base), mode="float32")
    bm = SegmentSearcher(
        spark, SegmentIndex.open(seg_base), mode="float32", prune="block_max"
    )
    a = [(r["doc_id"], bits(r["score"])) for r in ex.topk(q, k=10).collect()]
    b = [(r["doc_id"], bits(r["score"])) for r in bm.topk(q, k=10).collect()]
    assert a == b


def test_blockmax_multiwindow_coverage_regression():
    """Regression (ADVICE r1, high): window coverage used ``cover[w0] += 1``,
    which drops duplicate increments when several 128-posting blocks of one
    term start in the same 2048-doc window (any term denser than ~1 posting
    per 16 docs). The cumsum then went negative, ``touched`` under-counted,
    and conjunction mode zeroed windows that every MUST term does cover —
    silently dropping valid hits. This builds exactly that layout (dense
    term: 8 block-starts per window over a 4-window segment) and asserts
    block-max == exhaustive, including hits in the later windows."""
    from lucene_solr_spark.codecs.postings_codec import encode_postings
    from lucene_solr_spark.operators.topk import _SegmentEval
    from lucene_solr_spark.oracle import bm25, smallfloat

    n_docs = 8192  # 4 windows of 2048
    seg_docs = np.arange(n_docs, dtype=np.int64)
    norm_byte = smallfloat.int_to_byte4(7)
    seg_norms = np.full(n_docs, norm_byte, np.int64)

    # dense term: every 2nd doc -> 4096 postings = 32 full blocks, each
    # spanning 256 docIDs -> 8 blocks START in each 2048-doc window
    a_docs = np.arange(0, n_docs, 2, dtype=np.int64)
    # sparse term with hits in windows 0..3 (all even => all intersect a)
    b_docs = np.asarray([100, 3000, 4098, 7000], np.int64)
    enc = {
        "a": encode_postings(
            a_docs, np.ones(len(a_docs), np.int64), seg_norms[a_docs]
        ),
        "b": encode_postings(
            b_docs, np.ones(len(b_docs), np.int64), seg_norms[b_docs]
        ),
    }
    avgdl = np.float32(7.0)
    cache_f32 = bm25.norm_inverse_cache(1.2, 0.75, avgdl)
    inv_f64 = 1.0 / (
        1.2 * (0.25 + 0.75 * bm25.LENGTH_TABLE_F32.astype(np.float64) / 7.0)
    )
    ev = _SegmentEval(enc, seg_docs, seg_norms, "float32", cache_f32, inv_f64)
    wa = float(bm25.term_weight(1.0, bm25.idf(len(a_docs), n_docs)))
    wb = float(bm25.term_weight(1.0, bm25.idf(len(b_docs), n_docs)))
    sub_a = {"op": "term", "term": "a", "weight": wa}
    sub_b = {"op": "term", "term": "b", "weight": wb}

    def topk(docs, scores, k=10):
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return [(int(d), bits(s)) for d, s in zip(docs[order], scores[order])]

    for musts, shoulds in [
        ([sub_a, sub_b], []),  # conj: the hit-dropping shape
        ([], [sub_a, sub_b]),  # disjunction: bound under-count shape
    ]:
        plan = {
            "op": "bool",
            "musts": musts,
            "filters": [],
            "shoulds": shoulds,
            "nots": [],
            "msm": 0,
        }
        exhaustive = topk(*ev.eval(plan))
        pruned = topk(*ev.blockmax_topk(plan, 10))
        assert pruned == exhaustive
        assert len(exhaustive) > 0
    # the conjunction has exactly the 4 sparse-term docs as hits
    d, _ = ev.eval(
        {
            "op": "bool",
            "musts": [sub_a, sub_b],
            "filters": [],
            "shoulds": [],
            "nots": [],
            "msm": 0,
        }
    )
    assert d.tolist() == b_docs.tolist()


def test_batched_queries_one_job(searcher, tiny_oracle):
    res = searcher.topk_batch(
        {name: q for name, q in list(KERNEL_QUERIES.items())[:6]}, k=10
    )
    rows = res.collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], bits(r["score"])))
    for name in list(KERNEL_QUERIES)[:6]:
        expected = [
            (sd.doc_id, bits(sd.score))
            for sd in tiny_oracle.search(KERNEL_QUERIES[name], k=10)
        ]
        assert by_q.get(name, []) == expected, name


def test_manifest_lineage(seg_base):
    six = SegmentIndex.open(seg_base)
    m = six.manifest()
    assert m["doc_count"] == 100
    segs = m["segments"]
    assert len(segs) == 100 // 16 + 1
    assert sum(s["n_docs"] for s in segs) == 100
    for s in segs:
        assert s["min_doc"] >= s["segment_id"] * m["segment_size"]
        assert s["max_doc"] < (s["segment_id"] + 1) * m["segment_size"]
        assert s["n_postings"] > 0 and s["content_crc"] != 0


def test_rebuild_is_deterministic(spark, seg_base, tmp_path_factory):
    """Same input → identical manifest (the idempotency/resume invariant)."""
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=3)
    ix = build_index(corpus).persist()
    base2 = str(tmp_path_factory.mktemp("segix2"))
    build_segments(ix, base2, segment_size=16)
    m1 = SegmentIndex.open(seg_base).manifest()
    m2 = SegmentIndex.open(base2).manifest()
    assert m1["manifest_sha256"] == m2["manifest_sha256"]


def test_resume_skips_done_segments(spark, seg_base, tmp_path_factory):
    """resume=True with a complete manifest rewrites nothing and leaves the
    manifest hash unchanged."""
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=3)
    ix = build_index(corpus).persist()
    before = SegmentIndex.open(seg_base).manifest()["manifest_sha256"]
    build_segments(ix, seg_base, segment_size=16, resume=True)
    after = SegmentIndex.open(seg_base).manifest()["manifest_sha256"]
    assert before == after
