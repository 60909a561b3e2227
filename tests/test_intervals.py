"""Intervals API facade (queries/intervals/Intervals.java) — the builder
lowers onto the span IR; semantics pinned against the span oracle kernel
over hand-built position maps."""

from __future__ import annotations

from lucene_solr_spark.oracle.spans import eval_spans, spans_freq
from lucene_solr_spark.plans import intervals as I
from lucene_solr_spark.plans import ir


def spans(q, term_pos):
    return [(s, e) for s, e, _w in eval_spans(q, term_pos)]


def test_lowering_shapes():
    assert I.term("a") == ir.SpanTermQuery("a")
    assert I.phrase("a", "b") == ir.SpanNearQuery(("a", "b"), 0, True)
    assert I.ordered("a", "b", max_gaps=2) == ir.SpanNearQuery(("a", "b"), 2, True)
    assert I.unordered("a", "b", max_gaps=1) == ir.SpanNearQuery(("a", "b"), 1, False)
    assert I.maxgaps(3, I.ordered("a", "b")) == ir.SpanNearQuery(("a", "b"), 3, True)
    assert I.or_("a", I.phrase("b", "c")) == ir.SpanOrQuery(
        (ir.SpanTermQuery("a"), ir.SpanNearQuery(("b", "c"), 0, True))
    )


def test_maxgaps_filters_wide_matches():
    # doc: a x b ... a b  (positions: a@0, b@2 gap1; a@5, b@6 gap0)
    tp = {"a": [0, 5], "b": [2, 6]}
    assert spans(I.ordered("a", "b", max_gaps=0), tp) == [(5, 7)]
    got = spans(I.ordered("a", "b", max_gaps=1), tp)
    assert (0, 3) in got and (5, 7) in got


def test_containing_and_contained_by():
    # big = ordered(a..c) spans; little = term b
    tp = {"a": [0, 10], "b": [1, 20], "c": [2, 12]}
    big = I.ordered("a", "c", max_gaps=3)
    # big spans: (0,3) and (10,13); b@1 inside the first only
    assert spans(I.containing(big, "b"), tp) == [(0, 3)]
    assert spans(I.contained_by(I.term("b"), big), tp) == [(1, 2)]
    assert spans(I.not_contained_by(I.term("b"), big), tp) == [(20, 21)]


def test_or_union_and_freq():
    tp = {"x": [1, 4], "y": [2]}
    got = spans(I.or_("x", "y"), tp)
    assert got == [(1, 2), (2, 3), (4, 5)]
    assert spans_freq(eval_spans(I.or_("x", "y"), tp)) == 3.0


def test_not_containing_width1_exact():
    tp = {"a": [0, 10], "c": [2, 12], "b": [11]}
    big = I.ordered("a", "c", max_gaps=3)
    # b@11 sits inside (10,13) -> that span removed, (0,3) kept
    assert spans(I.not_containing(big, "b"), tp) == [(0, 3)]
