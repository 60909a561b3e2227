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


def test_not_containing_partial_overlap_kept():
    """The round-5 exactness fix (Intervals.notContaining,
    DifferenceIntervalsSource): a subtrahend interval that merely
    OVERLAPS the minuend does not disqualify it — only true containment
    does. The earlier SpanNot lowering dropped these."""
    # minuend = ordered(a,c) span (0,3); subtrahend = phrase(c,d) span
    # (2,4): overlaps positions {2} of the minuend but sticks out at 3
    tp = {"a": [0], "c": [2], "d": [3]}
    minu = I.ordered("a", "c", max_gaps=3)
    sub = I.phrase("c", "d")
    assert spans(sub, tp) == [(2, 4)]
    assert spans(I.not_containing(minu, sub), tp) == [(0, 3)]  # KEPT
    # contrast: a fully-inside subtrahend removes the span
    tp2 = {"a": [0], "c": [3], "d": [2], "e": [1]}
    minu2 = I.ordered("a", "c", max_gaps=3)  # span (0,4)
    sub2 = I.phrase("e", "d")  # span (1,3) ⊂ (0,4)
    assert spans(I.not_containing(minu2, sub2), tp2) == []


def test_not_contained_by_partial_overlap_kept():
    """Intervals.notContainedBy: overlap without enclosure keeps the
    little interval (the old SpanNot lowering removed it)."""
    # little = phrase(b,d) span (1,3); big = ordered(a,b) span (0,2):
    # overlaps little at position 1 but does not enclose it
    tp = {"a": [0], "b": [1], "d": [2]}
    little = I.phrase("b", "d")
    big = I.ordered("a", "b", max_gaps=2)
    assert spans(big, tp) == [(0, 2)]
    assert spans(I.not_contained_by(little, big), tp) == [(1, 3)]  # KEPT
    # enclosed little is removed
    tp2 = {"a": [0], "b": [1], "d": [2], "z": [4]}
    big2 = I.ordered("a", "z", max_gaps=4)  # span (0,5) ⊇ (1,3)
    assert spans(I.not_contained_by(little, big2), tp2) == []


def test_not_containing_executor_rank_identity(spark, tiny_corpus_rows, tiny_oracle):
    """SpanNotContaining through the DataFrame executor == the single-node
    oracle, bit-for-bit (same kernel, postings-join + pandas UDF path)."""
    import struct

    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    def bits(x):
        return struct.unpack("<I", struct.pack("<f", float(x)))[0]

    corpus = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id long, content string",
    )
    ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="float32")
    q = I.not_containing(I.unordered("the", "of", max_gaps=6), I.term("a"))
    got = {r["doc_id"]: bits(r["score"]) for r in ex.matches(q).collect()}
    want = {d: bits(s) for d, s in tiny_oracle.matches(q).items()}
    assert got == want and got
