"""Intervals query API — the ``lucene/queries/src/java/org/apache/
lucene/queries/intervals/Intervals.java`` builder surface, lowered onto
this engine's span algebra IR (the two frameworks share the minimal-
interval semantics of Vigna 2013 "Quasi-succinct indices"; Lucene's
intervals package is the successor API to spans).

Each function returns a ``plans.ir`` span query that both executors and
the oracle evaluate — so every interval expression inherits the span
kernels' positional evaluation and their oracle parity tests.

Semantics notes (divergences called out, mirroring the reference docs):
- ``max_gaps`` maps onto span slop: for an ORDERED interval of k terms,
  the number of non-matched positions inside the match window equals the
  span's slop (width − minimal width), so ``maxgaps(g, ordered(...))``
  is exactly ``SpanNear(slop=g, in_order=True)``. For UNORDERED sources
  the same width argument applies (``IntervalsSource`` unordered gap =
  width − k + 1).
- ``or_``/``containing``/``contained_by`` map 1:1 to SpanOr /
  SpanContaining / SpanWithin; ``not_containing``/``not_contained_by``
  lower to the dedicated containment-complement span nodes
  (SpanNotContaining / SpanNotWithin — round 5, replacing the earlier
  overlap-based SpanNot approximation).
"""

from __future__ import annotations

from lucene_solr_spark.plans import ir

__all__ = [
    "term",
    "phrase",
    "ordered",
    "unordered",
    "maxgaps",
    "or_",
    "containing",
    "contained_by",
    "not_containing",
    "not_contained_by",
]

_UNBOUNDED = 1 << 20  # Intervals.ordered default: any gaps


def _leaf(s) -> ir.Query:
    return ir.SpanTermQuery(s) if isinstance(s, str) else s


def term(t: str) -> ir.Query:
    """``Intervals.term`` — width-1 interval per occurrence."""
    return ir.SpanTermQuery(t)


def phrase(*terms: str) -> ir.Query:
    """``Intervals.phrase`` — consecutive ordered terms (gap 0)."""
    return ir.SpanNearQuery(tuple(terms), slop=0, in_order=True)


def ordered(*terms: str, max_gaps: int = -1) -> ir.Query:
    """``Intervals.ordered`` (+ optional ``Intervals.maxgaps``)."""
    slop = _UNBOUNDED if max_gaps < 0 else max_gaps
    return ir.SpanNearQuery(tuple(terms), slop=slop, in_order=True)


def unordered(*terms: str, max_gaps: int = -1) -> ir.Query:
    """``Intervals.unordered`` (+ optional ``Intervals.maxgaps``)."""
    slop = _UNBOUNDED if max_gaps < 0 else max_gaps
    return ir.SpanNearQuery(tuple(terms), slop=slop, in_order=False)


def maxgaps(gaps: int, source: ir.Query) -> ir.Query:
    """``Intervals.maxGaps(gaps, source)`` — restrict a near source's
    internal gap budget."""
    if not isinstance(source, ir.SpanNearQuery):
        raise TypeError("maxgaps applies to ordered/unordered sources")
    return ir.SpanNearQuery(source.terms, slop=gaps, in_order=source.in_order)


def or_(*sources) -> ir.Query:
    """``Intervals.or`` — union of sub-intervals."""
    return ir.SpanOrQuery(tuple(_leaf(s) for s in sources))


def containing(big, little) -> ir.Query:
    """``Intervals.containing(big, small)`` — big intervals that contain
    a small interval."""
    return ir.SpanContainingQuery(_leaf(big), _leaf(little))


def contained_by(little, big) -> ir.Query:
    """``Intervals.containedBy(small, big)`` — small intervals enclosed
    by a big interval."""
    return ir.SpanWithinQuery(_leaf(big), _leaf(little))


def not_containing(minuend, subtrahend) -> ir.Query:
    """``Intervals.notContaining`` — minuend intervals with NO subtrahend
    interval inside them. EXACT (round 5): lowered to the containment-
    complement node (``DifferenceIntervalsSource`` semantics — a
    partially-overlapping subtrahend does NOT disqualify, unlike
    SpanNot's overlap rule)."""
    return ir.SpanNotContainingQuery(_leaf(minuend), _leaf(subtrahend))


def not_contained_by(little, big) -> ir.Query:
    """``Intervals.notContainedBy`` — small intervals not enclosed by any
    big interval. EXACT (round 5): containment-complement node (overlap
    without enclosure keeps the interval)."""
    return ir.SpanNotWithinQuery(big=_leaf(big), little=_leaf(little))
