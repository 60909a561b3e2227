"""SpanNearQuery (ordered/unordered proximity) tests.

- kernel-level golden matches (hand-computed widths/freqs);
- rank identity: SegmentSearcher AND DFExecutor vs the single-node
  oracle, exact (doc_id, float32 bits) equality;
- match-set equivalence with the ∃-pair SQL condition (the gate shape).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
from lucene_solr_spark.operators.topk import SegmentSearcher
from lucene_solr_spark.oracle.spans import span_near_freq, span_near_matches
from lucene_solr_spark.plans import ir
from lucene_solr_spark.sources.corpus import corpus_to_spark


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


# ---------------------------------------------------------------- kernel
def test_ordered_matches_golden():
    # a at 0,10; b at 3,11 — chains: (0,3) w=2, (10,11) w=0
    assert span_near_matches([[0, 10], [3, 11]], 2, True) == [2, 0]
    # slop 1 drops the first
    assert span_near_matches([[0, 10], [3, 11]], 1, True) == [0]
    # order matters: b before a only
    assert span_near_matches([[5], [3]], 10, True) == []
    assert span_near_matches([[5], [3]], 10, False) == [1]


def test_ordered_three_terms():
    # a=0, b=2, c=3 → width = 3-0-2 = 1
    assert span_near_matches([[0], [2], [3]], 1, True) == [1]
    assert span_near_matches([[0], [2], [3]], 0, True) == []


def test_ordered_non_overlap():
    # same position cannot chain (next start must be > prev)
    assert span_near_matches([[4], [4]], 5, True) == []
    assert span_near_matches([[4], [5]], 0, True) == [0]


def test_unordered_minimal_windows():
    # a at 0,6; b at 4 — left-minimal windows: [0..4] w=3, [4..6] w=1
    assert span_near_matches([[0, 6], [4]], 3, False) == [3, 1]
    assert span_near_matches([[0, 6], [4]], 1, False) == [1]


def test_unordered_three_terms():
    # a=0, b=1, c=5 → window [0..5] width 3
    assert span_near_matches([[0], [1], [5]], 3, False) == [3]
    assert span_near_matches([[0], [1], [5]], 2, False) == []


def test_freq_accumulation_float32():
    f = span_near_freq([[0, 10], [3, 11]], 2, True)
    expected = np.float32(
        np.float32(1.0) / np.float32(3.0) + np.float32(1.0) / np.float32(1.0)
    )
    assert bits(f) == bits(expected)


def test_unordered_duplicate_terms_follow_reference():
    """Repeated terms unordered: one occurrence may serve both clauses
    (NearSpansUnordered overlap semantics) — a single 'x' matches."""
    from lucene_solr_spark.oracle.spans import eval_spans

    q = ir.SpanNearQuery(("x", "x"), slop=2, in_order=False)
    spans = eval_spans(q, {"x": np.array([3])})
    assert (3, 4, 0) in spans


# ------------------------------------------------------------ engines
SPAN_QUERIES = {
    "ordered_s2": ir.SpanNearQuery(("table", "scan"), slop=2, in_order=True),
    "ordered_s5": ir.SpanNearQuery(("merge", "window"), slop=5, in_order=True),
    "unordered_s3": ir.SpanNearQuery(("table", "scan"), slop=3, in_order=False),
    "three_ordered": ir.SpanNearQuery(("def", "return", "x"), slop=8, in_order=True),
    "in_bool": ir.BooleanQuery(
        (
            ir.BooleanClause(
                ir.Occur.MUST, ir.SpanNearQuery(("x", "y"), slop=1, in_order=False)
            ),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("def")),
        ),
        0,
    ),
}


@pytest.fixture(scope="module")
def span_setup(spark, tmp_path_factory, tiny_oracle):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=5)
    ix = build_index(corpus).persist()
    base = str(tmp_path_factory.mktemp("spanix"))
    build_segments(ix, base, segment_size=16)
    from lucene_solr_spark.plans.df_executor import DFExecutor

    return (
        SegmentSearcher(spark, SegmentIndex.open(base), mode="float32"),
        DFExecutor(ix, mode="float32"),
    )


@pytest.mark.parametrize("name", sorted(SPAN_QUERIES))
def test_span_rank_identity(name, span_setup, tiny_oracle):
    q = SPAN_QUERIES[name]
    expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    searcher, dfex = span_setup
    got_k = [
        (r["doc_id"], bits(r["score"]))
        for r in searcher.topk(q, k=10).collect()
    ]
    got_df = [
        (r["doc_id"], bits(r["score"])) for r in dfex.topk(q, k=10).collect()
    ]
    assert got_k == expected, f"kernel {name}"
    assert got_df == expected, f"df {name}"


# ------------------------------------------------- span algebra (r3)
def test_or_spans_merge_order():
    from lucene_solr_spark.oracle.spans import or_spans

    assert or_spans([[(5, 6, 0), (1, 4, 1)], [(1, 2, 0)]]) == [
        (1, 2, 0),
        (1, 4, 1),
        (5, 6, 0),
    ]


def test_not_spans_overlap_rules():
    from lucene_solr_spark.oracle.spans import not_spans

    inc = [(1, 4, 1), (8, 10, 0)]
    # exclude at 3 overlaps [1,4); exclude at 10 does NOT overlap [8,10)
    assert not_spans(inc, [(3, 4, 0)]) == [(8, 10, 0)]
    assert not_spans(inc, [(10, 11, 0)]) == inc
    # post widens the exclusion window backward onto [8,10)
    assert not_spans(inc, [(10, 11, 0)], post=1) == [(1, 4, 1)]
    assert not_spans(inc, []) == inc


def test_within_containing_asymmetry():
    """within yields the LITTLE spans, containing yields the BIG spans —
    same doc set, different span streams (SpanWithinQuery.java:33 vs
    SpanContainingQuery.java:33)."""
    from lucene_solr_spark.oracle.spans import containing_spans, within_spans

    big = [(0, 6, 4)]
    little = [(1, 4, 1), (5, 9, 2)]
    assert within_spans(big, little) == [(1, 4, 1)]
    assert containing_spans(big, little) == [(0, 6, 4)]


COMPOSITE_QUERIES = {
    "or_two_nears": ir.SpanOrQuery(
        (
            ir.SpanNearQuery(("table", "scan"), slop=2, in_order=True),
            ir.SpanNearQuery(("merge", "window"), slop=3, in_order=True),
        )
    ),
    "or_near_term": ir.SpanOrQuery(
        (
            ir.SpanNearQuery(("table", "scan"), slop=1, in_order=True),
            ir.SpanTermQuery("vector"),
        )
    ),
    "not_near_term": ir.SpanNotQuery(
        ir.SpanNearQuery(("table", "scan"), slop=3, in_order=True),
        ir.SpanTermQuery("merge"),
    ),
    "within_nears": ir.SpanWithinQuery(
        big=ir.SpanNearQuery(("def", "class"), slop=8, in_order=True),
        little=ir.SpanNearQuery(("def", "import"), slop=2, in_order=True),
    ),
    "containing_nears": ir.SpanContainingQuery(
        big=ir.SpanNearQuery(("def", "class"), slop=8, in_order=True),
        little=ir.SpanNearQuery(("def", "import"), slop=2, in_order=True),
    ),
    # SpanFirstQuery.java:34: match must END within the first N positions
    "first_term": ir.SpanFirstQuery(ir.SpanTermQuery("def"), 5),
    "first_near": ir.SpanFirstQuery(
        ir.SpanNearQuery(("def", "import"), slop=3, in_order=True), 12
    ),
}


@pytest.mark.parametrize("name", sorted(COMPOSITE_QUERIES))
def test_composite_span_rank_identity(name, span_setup, tiny_oracle):
    q = COMPOSITE_QUERIES[name]
    expected = [(sd.doc_id, bits(sd.score)) for sd in tiny_oracle.search(q, k=10)]
    searcher, dfex = span_setup
    got_k = [
        (r["doc_id"], bits(r["score"])) for r in searcher.topk(q, k=10).collect()
    ]
    got_df = [
        (r["doc_id"], bits(r["score"])) for r in dfex.topk(q, k=10).collect()
    ]
    assert got_k == expected, f"kernel {name}"
    assert got_df == expected, f"df {name}"


def test_within_containing_same_docs_different_freqs(tiny_oracle):
    """The two filtered forms agree on the DOC set but score from
    different span streams."""
    w = tiny_oracle.matches(COMPOSITE_QUERIES["within_nears"])
    c = tiny_oracle.matches(COMPOSITE_QUERIES["containing_nears"])
    assert set(w) == set(c)
    assert len(w) > 0


def test_span_set_matches_exists_pair(span_setup, tiny_oracle):
    """2-term span-near MATCH SET ⟺ ∃ pa, pb with the width condition —
    the invariant the SQL gate oracle relies on."""
    searcher, _ = span_setup
    oidx = tiny_oracle
    for in_order, slop in ((True, 2), (False, 3)):
        q = ir.SpanNearQuery(("table", "scan"), slop=slop, in_order=in_order)
        got = {r["doc_id"] for r in searcher.matches(q).collect()}
        exp = set()
        a_post = oidx.positions.get("table", {})
        b_post = oidx.positions.get("scan", {})
        for d in set(a_post) & set(b_post):
            pairs = [
                (pa, pb) for pa in a_post[d] for pb in b_post[d]
            ]
            if in_order:
                hit = any(pb > pa and pb - pa - 1 <= slop for pa, pb in pairs)
            else:
                hit = any(
                    pa != pb and abs(pb - pa) - 1 <= slop for pa, pb in pairs
                )
            if hit:
                exp.add(d)
        assert got == exp, (in_order, slop)


# -------------------------- SpanMultiTermQueryWrapper (round 4)
def test_wrapper_expansion_equals_manual_spanor(span_setup, tiny_oracle):
    """near(prefix-wrapper, term) == near(SpanOr of the expanded terms,
    term) == oracle engine, bit-for-bit (DF executor path)."""
    _, dfex = span_setup
    wrapped = ir.SpanNearClauseQuery(
        (
            ir.SpanMultiTermWrapper(ir.PrefixQuery("fo")),
            ir.SpanTermQuery("self"),
        ),
        slop=4,
        in_order=True,
    )
    expanded_terms = sorted(tiny_oracle.expand_multiterm(ir.PrefixQuery("fo")))
    assert expanded_terms, "corpus should have fo* terms"
    manual = ir.SpanNearClauseQuery(
        (
            ir.SpanOrQuery(tuple(ir.SpanTermQuery(t) for t in expanded_terms)),
            ir.SpanTermQuery("self"),
        ),
        slop=4,
        in_order=True,
    )
    got = {r["doc_id"]: bits(r["score"]) for r in dfex.matches(wrapped).collect()}
    man = {r["doc_id"]: bits(r["score"]) for r in dfex.matches(manual).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(wrapped).items()}
    assert got == man == want and got


def test_wrapper_empty_expansion_matches_nothing(span_setup):
    _, dfex = span_setup
    q = ir.SpanNearClauseQuery(
        (
            ir.SpanMultiTermWrapper(ir.PrefixQuery("zzzzqx")),
            ir.SpanTermQuery("self"),
        ),
        slop=4,
    )
    assert dfex.matches(q).count() == 0


def test_wrapper_inside_span_or(span_setup, tiny_oracle):
    """Wrapper as a SpanOr branch: union with a plain term."""
    _, dfex = span_setup
    q = ir.SpanOrQuery(
        (ir.SpanMultiTermWrapper(ir.PrefixQuery("fo")), ir.SpanTermQuery("self"))
    )
    got = {r["doc_id"]: bits(r["score"]) for r in dfex.matches(q).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(q).items()}
    assert got == want and got


def test_clause_near_unordered_overlap_matches_like_reference():
    """Unordered near with overlapping clause term sets follows
    NearSpansUnordered: the SAME occurrence may serve both clauses
    ((max end − min start) − Σ lengths ≤ slop, overlap allowed)."""
    from lucene_solr_spark.oracle.spans import eval_spans

    q = ir.SpanNearClauseQuery(
        (
            ir.SpanOrQuery((ir.SpanTermQuery("a"), ir.SpanTermQuery("b"))),
            ir.SpanTermQuery("a"),
        ),
        slop=2,
        in_order=False,
    )
    spans = eval_spans(q, {"a": np.array([0, 5]), "b": np.array([2])})
    # a@0 serving both clauses → (0,1); b@2+a@0 gap 1 → (0,3); a@5 alone
    assert (0, 1, 0) in spans and (5, 6, 0) in spans
    assert any(s == 0 and e == 3 for s, e, _ in spans)
