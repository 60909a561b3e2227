"""Span-near matching kernel — proximity algebra over positions.

Re-expresses the reference's span layer for term sub-spans (each term
occurrence is a width-1 span):

- ``search/spans/SpanNearQuery.java:42`` — matches spans near one
  another; ``slop`` = max number of intervening positions; ``inOrder``
  requires the clause order.
- ordered (``NearSpansOrdered``): sub-spans must be non-overlapping and
  in clause order (next start ≥ previous end), match width =
  ``p_n - p_1 - (n-1)`` (total gap between consecutive spans); a match
  is enumerated per anchor position of the FIRST clause with the
  greedy-minimal completion (advancing the first sub-span between
  matches, the ``nextStartPosition`` discipline).
- unordered (``NearSpansUnordered``): minimal windows covering one
  occurrence of every clause, width = ``(max - min + 1) - n``; each
  left-minimal window is one match. Duplicate terms are rejected
  (Lucene routes repeats through its own overlap machinery; we refuse
  rather than silently mis-score).
- scoring: like sloppy phrases, each match contributes
  ``1/(1+width)`` accumulated in float32
  (``search/spans/SpanScorer.java`` sloppyFreq accumulation), and the
  float freq feeds BM25 with the summed-idf weight of all clause terms
  (``search/spans/SpanWeight.java`` buildSimWeight merges term stats).

The same kernel drives the single-node oracle, the DataFrame executor
and the segment kernel, so all three agree by construction.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "span_near_matches",
    "span_near_freq",
    "Span",
    "term_spans",
    "near_spans",
    "or_spans",
    "not_spans",
    "within_spans",
    "containing_spans",
    "eval_spans",
    "spans_freq",
]

#: a span = (start, end, width): positions [start, end) plus the slop
#: width the match was found at (0 for a term span; near spans carry the
#: total intervening gap — the value the sloppyFreq fold feeds on)
Span = tuple


def _ordered_spans(pos_lists: list, slop: int) -> list[Span]:
    n = len(pos_lists)
    lists = [np.asarray(pl, dtype=np.int64) for pl in pos_lists]
    spans: list[Span] = []
    for p1 in lists[0].tolist():
        prev = p1
        ok = True
        for i in range(1, n):
            nxt = lists[i]
            j = int(np.searchsorted(nxt, prev + 1))  # next start ≥ prev end
            if j >= len(nxt):
                ok = False
                break
            prev = int(nxt[j])
        if ok:
            width = prev - p1 - (n - 1)
            if width <= slop:
                spans.append((p1, prev + 1, width))
    return spans


def _unordered_spans(pos_lists: list, slop: int) -> list[Span]:
    n = len(pos_lists)
    events: list[tuple[int, int]] = []
    for s, pl in enumerate(pos_lists):
        events.extend((int(p), s) for p in pl)
    events.sort()
    counts = [0] * n
    have = 0
    spans: list[Span] = []
    left = 0
    for r in range(len(events)):
        counts[events[r][1]] += 1
        if counts[events[r][1]] == 1:
            have += 1
        while have == n:
            # shrink to the left-minimal covering window
            if counts[events[left][1]] > 1:
                counts[events[left][1]] -= 1
                left += 1
                continue
            width = events[r][0] - events[left][0] + 1 - n
            if width <= slop:
                spans.append((events[left][0], events[r][0] + 1, width))
            counts[events[left][1]] -= 1
            have -= 1
            left += 1
    return spans


def _ordered_matches(pos_lists: list, slop: int) -> list[int]:
    return [w for _, _, w in _ordered_spans(pos_lists, slop)]


def _unordered_matches(pos_lists: list, slop: int) -> list[int]:
    return [w for _, _, w in _unordered_spans(pos_lists, slop)]


# --------------------------------------------------------- span algebra
def term_spans(positions) -> list[Span]:
    """SpanTermQuery (``spans/SpanTermQuery.java:35``): each term
    occurrence is the width-0 span [pos, pos+1)."""
    return [(int(p), int(p) + 1, 0) for p in positions]


def near_spans(pos_lists: list, slop: int, in_order: bool) -> list[Span]:
    """SpanNearQuery span enumeration — same matches as
    ``span_near_matches`` but carrying the (start, end) intervals."""
    if any(len(pl) == 0 for pl in pos_lists):
        return []
    if in_order:
        return _ordered_spans(pos_lists, slop)
    return _unordered_spans(pos_lists, slop)


def or_spans(children: list) -> list[Span]:
    """SpanOrQuery (``spans/SpanOrQuery.java:39``): union of the
    sub-spans, emitted in (start, end) order (``SpanOrQuery.java:247-267``
    byPositionQueue ordering)."""
    out: list[Span] = []
    for c in children:
        out.extend(c)
    out.sort(key=lambda s: (s[0], s[1]))
    return out


def not_spans(
    include: list, exclude: list, pre: int = 0, post: int = 0
) -> list[Span]:
    """SpanNotQuery (``spans/SpanNotQuery.java:42``): spans of ``include``
    that overlap no span of ``exclude`` widened by ``pre``/``post``
    positions (``SpanNotQuery.java:135-160`` twoPhase match test)."""
    if not exclude:
        return list(include)
    starts = np.asarray([s[0] for s in exclude], dtype=np.int64)
    ends = np.asarray([s[1] for s in exclude], dtype=np.int64)
    out = []
    for s, e, w in include:
        # overlap iff some exclude span has xs < e+post and xe > s-pre
        k = np.searchsorted(starts, e + post)  # spans with xs < e+post
        if k == 0 or not (ends[:k] > s - pre).any():
            out.append((s, e, w))
    return out


def within_spans(big: list, little: list) -> list[Span]:
    """SpanWithinQuery (``spans/SpanWithinQuery.java:33``): spans of
    ``little`` that are enclosed by a span of ``big``."""
    return [
        (s, e, w)
        for s, e, w in little
        if any(bs <= s and e <= be for bs, be, _ in big)
    ]


def containing_spans(big: list, little: list) -> list[Span]:
    """SpanContainingQuery (``spans/SpanContainingQuery.java:33``): spans
    of ``big`` that contain a span of ``little``."""
    return [
        (s, e, w)
        for s, e, w in big
        if any(s <= ls and le <= e for ls, le, _ in little)
    ]


def not_containing_spans(minuend: list, subtrahend: list) -> list[Span]:
    """``Intervals.notContaining`` (``queries/intervals/Intervals.java``,
    ``DifferenceIntervalsSource``): minuend spans with NO subtrahend span
    inside them — exclusion by CONTAINMENT (a partially-overlapping
    subtrahend does NOT disqualify, unlike SpanNot's overlap rule)."""
    return [
        (s, e, w)
        for s, e, w in minuend
        if not any(s <= xs and xe <= e for xs, xe, _ in subtrahend)
    ]


def not_within_spans(big: list, little: list) -> list[Span]:
    """``Intervals.notContainedBy``: little spans not enclosed by any big
    span — the containment complement of within_spans (overlap without
    enclosure keeps the span)."""
    return [
        (s, e, w)
        for s, e, w in little
        if not any(bs <= s and e <= be for bs, be, _ in big)
    ]


def _clause_terms(c) -> tuple:
    """Terms of a near CLAUSE: a SpanTermQuery or a SpanOrQuery of them."""
    from lucene_solr_spark.plans import ir

    if isinstance(c, ir.SpanTermQuery):
        return (c.term,)
    if isinstance(c, ir.SpanOrQuery) and all(
        isinstance(s, ir.SpanTermQuery) for s in c.clauses
    ):
        return tuple(s.term for s in c.clauses)
    raise TypeError(
        f"span-near clause must be term or or-of-terms, got {type(c).__name__}"
    )


def near_spans_general(
    clause_spans: list, slop: int, in_order: bool
) -> list[Span]:
    """Span-near over GENERAL sub-span lists (nested SpanNearClauseQuery
    clauses, overlapping clause terms, repeated unordered terms): pick
    one span per clause; ordered requires non-overlapping clause-order
    picks with total gap ``Σ (next_start − prev_end)`` ≤ slop
    (NearSpansOrdered); unordered allows OVERLAP — the same occurrence
    may serve several clauses — with
    ``(max end − min start) − Σ lengths`` ≤ slop (NearSpansUnordered).
    Matches are enumerated exhaustively with gap pruning
    (single-document lists — the percolation/oracle path)."""
    n = len(clause_spans)
    if n == 0:
        return []
    lists = [sorted(set(cs)) for cs in clause_spans]
    if any(not cs for cs in lists):
        return []
    out: set = set()

    def rec_ordered(idx: int, first_start: int, prev_end: int, gap: int):
        if idx == n:
            out.add((first_start, prev_end, gap))
            return
        for st, en, _w in lists[idx]:
            if st < prev_end:
                continue
            g = gap + (st - prev_end)
            if g > slop:
                break  # sorted by start: later spans only widen the gap
            rec_ordered(idx + 1, first_start, en, g)

    if in_order:
        for st, en, _w in lists[0]:
            rec_ordered(1, st, en, 0)
    else:
        import itertools

        # NearSpansUnordered: sub-spans MAY overlap (each clause iterates
        # its own spans independently); match when
        # (max end − min start) − Σ lengths ≤ slop
        # (spans/NearSpansUnordered.java width computation)
        for combo in itertools.product(*lists):
            starts = [c[0] for c in combo]
            ends = [c[1] for c in combo]
            total_len = sum(e - st for st, e, _ in combo)
            gap = (max(ends) - min(starts)) - total_len
            if gap <= slop:
                out.add((min(starts), max(ends), max(gap, 0)))
    return sorted(out)


def eval_spans(node, term_pos: dict) -> list[Span]:
    """Evaluate a span-query IR tree (plans.ir Span* nodes) over one
    document's ``term -> sorted positions array`` map. The single-node
    reference kernel behind the DataFrame executor's span pandas UDF."""
    from lucene_solr_spark.plans import ir

    if isinstance(node, ir.SpanTermQuery):
        return term_spans(term_pos.get(node.term, ()))
    if isinstance(node, ir.SpanNearQuery):
        if not node.in_order and len(set(node.terms)) != len(node.terms):
            # repeated terms unordered: NearSpansUnordered lets one
            # occurrence serve several clauses — general matcher
            return near_spans_general(
                [
                    term_spans(term_pos.get(t, ()))
                    for t in node.terms
                ],
                node.slop,
                node.in_order,
            )
        return near_spans(
            [np.asarray(term_pos.get(t, ()), np.int64) for t in node.terms],
            node.slop,
            node.in_order,
        )
    if isinstance(node, ir.SpanNearClauseQuery):
        # clause-based near (SpanNearQuery over SpanQuery clauses): a
        # clause's positions are the UNION of its terms' width-1 spans —
        # exactly SpanOrQuery's ordered union of sub-spans.  Clauses
        # beyond term/or-of-terms (nested nears, span algebra) take the
        # general sub-span matcher.
        try:
            groups = [_clause_terms(c) for c in node.clauses]
        except TypeError:
            return near_spans_general(
                [eval_spans(c, term_pos) for c in node.clauses],
                node.slop,
                node.in_order,
            )
        if not node.in_order:
            seen0: set[str] = set()
            overlap = False
            for g in groups:
                if seen0 & set(g):
                    overlap = True
                    break
                seen0 |= set(g)
            if overlap:
                # clauses sharing terms: the reference's unordered near
                # allows the SAME occurrence to serve several clauses —
                # evaluate through the general sub-span matcher
                return near_spans_general(
                    [eval_spans(c, term_pos) for c in node.clauses],
                    node.slop,
                    node.in_order,
                )
        lists = []
        for g in groups:
            if len(g) == 1:
                lists.append(np.asarray(term_pos.get(g[0], ()), np.int64))
            else:
                merged = np.unique(
                    np.concatenate(
                        [np.asarray(term_pos.get(t, ()), np.int64) for t in g]
                        or [np.empty(0, np.int64)]
                    )
                )
                lists.append(merged)
        return near_spans(lists, node.slop, node.in_order)
    if isinstance(node, ir.SpanMultiTermWrapper):
        raise TypeError(
            "SpanMultiTermWrapper must be dictionary-expanded by the "
            "executor before kernel evaluation"
        )
    if isinstance(node, ir.SpanOrQuery):
        return or_spans([eval_spans(c, term_pos) for c in node.clauses])
    if isinstance(node, ir.SpanNotQuery):
        return not_spans(
            eval_spans(node.include, term_pos),
            eval_spans(node.exclude, term_pos),
            node.pre,
            node.post,
        )
    if isinstance(node, ir.SpanWithinQuery):
        return within_spans(
            eval_spans(node.big, term_pos), eval_spans(node.little, term_pos)
        )
    if isinstance(node, ir.SpanContainingQuery):
        return containing_spans(
            eval_spans(node.big, term_pos), eval_spans(node.little, term_pos)
        )
    if isinstance(node, ir.SpanNotContainingQuery):
        return not_containing_spans(
            eval_spans(node.minuend, term_pos),
            eval_spans(node.subtrahend, term_pos),
        )
    if isinstance(node, ir.SpanNotWithinQuery):
        return not_within_spans(
            eval_spans(node.big, term_pos), eval_spans(node.little, term_pos)
        )
    if isinstance(node, ir.SpanFirstQuery):
        # SpanFirstQuery.java:34 / SpanPositionRangeQuery: keep spans
        # whose END position is ≤ end (match fully inside [0, end))
        return [sp for sp in eval_spans(node.match, term_pos) if sp[1] <= node.end]
    raise TypeError(f"not a span query: {type(node).__name__}")


def spans_freq(spans: list) -> float:
    """Float32-accumulated sloppyFreq over enumerated spans
    (``spans/SpanScorer.java:119-133`` setFreqCurrentDoc)."""
    if not spans:
        return 0.0
    freq = np.float32(0.0)
    for _, _, w in spans:
        freq = np.float32(freq + np.float32(1.0) / (np.float32(1.0) + np.float32(w)))
    return float(freq)


def span_near_matches(pos_lists: list, slop: int, in_order: bool) -> list[int]:
    """Match widths (each ≤ slop) of the span-near query over one doc.

    ``pos_lists[i]`` = sorted absolute positions of clause i."""
    if any(len(pl) == 0 for pl in pos_lists):
        return []
    if in_order:
        return _ordered_matches(pos_lists, slop)
    return _unordered_matches(pos_lists, slop)


def span_near_freq(pos_lists: list, slop: int, in_order: bool) -> float:
    """Float32-accumulated sloppyFreq over the matches; 0.0 = no match."""
    widths = span_near_matches(pos_lists, slop, in_order)
    if not widths:
        return 0.0
    freq = np.float32(0.0)
    for w in widths:
        freq = np.float32(freq + np.float32(1.0) / (np.float32(1.0) + np.float32(w)))
    return float(freq)
