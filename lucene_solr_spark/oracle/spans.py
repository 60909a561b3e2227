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

__all__ = ["span_near_matches", "span_near_freq"]


def _ordered_matches(pos_lists: list, slop: int) -> list[int]:
    n = len(pos_lists)
    lists = [np.asarray(pl, dtype=np.int64) for pl in pos_lists]
    widths: list[int] = []
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
                widths.append(width)
    return widths


def _unordered_matches(pos_lists: list, slop: int) -> list[int]:
    n = len(pos_lists)
    events: list[tuple[int, int]] = []
    for s, pl in enumerate(pos_lists):
        events.extend((int(p), s) for p in pl)
    events.sort()
    counts = [0] * n
    have = 0
    widths: list[int] = []
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
                widths.append(width)
            counts[events[left][1]] -= 1
            have -= 1
            left += 1
    return widths


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
