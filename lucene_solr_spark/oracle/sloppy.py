"""Sloppy-phrase matching kernel — reference semantics re-expressed.

Mirrors ``search/SloppyPhraseMatcher.java`` for the no-repeated-term case
(``initSimple`` path, ``:381-393``):

- per-term adjusted positions ``position - queryOffset``
  (``search/PhrasePositions.java:51-58``) so an exact match aligns all pps;
- a priority queue ordered by (position, offset, ord)
  (``search/PhraseQueue.java:27-39``);
- ``nextMatch`` (``SloppyPhraseMatcher.java:174-206``): pop the least pp,
  ``matchLength = end - pp.position``, advance it past the queue top while
  minimizing matchLength, declare a match when ``matchLength <= slop``;
- per-match weight ``1f / (1f + matchLength)`` (``:169-171``), accumulated
  in FLOAT across matches (``search/PhraseScorer.java:76-79``), and the
  resulting float freq feeds BM25 unchanged.

Repeated query terms take Lucene's ``initComplex`` machinery
(rptGroups/collisions, ``:286-363``) — detected and rejected here with
NotImplementedError rather than silently mis-scored.

The same kernel drives the single-node oracle, the DataFrame executor's
pandas UDF, and the segment search kernel, so all three agree by
construction.
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["sloppy_phrase_freq", "sloppy_phrase_match_lengths"]


class _PP:
    __slots__ = ("plist", "k", "off", "ord", "pos")

    def __init__(self, plist, off, ord_):
        self.plist = plist
        self.off = off
        self.ord = ord_
        self.k = 1
        self.pos = int(plist[0]) - off

    def key(self):
        return (self.pos, self.off, self.ord)


def sloppy_phrase_match_lengths(
    pos_lists: list, offsets: list[int], slop: int
) -> list[int]:
    """The sequence of match lengths the greedy matcher accepts
    (``matchLength <= slop`` at ``SloppyPhraseMatcher.java:169``), in match
    order. ``sloppy_phrase_freq`` is the float32 fold of this list; the
    integer list itself is the exactly-SQL-gateable artifact (for the
    2-term case the sequence has a closed alternating-successor form —
    see __spark_entry__.oracle_sql['sloppy_phrase_matches']).

    ``pos_lists[i]`` = sorted absolute positions of term i in the doc;
    ``offsets[i]`` = the term's position in the query phrase.
    """
    if len(set(offsets)) != len(offsets):
        raise ValueError("duplicate phrase offsets")

    end = -(1 << 62)
    pps = []
    for i, (plist, off) in enumerate(zip(pos_lists, offsets)):
        if len(plist) == 0:
            return []
        pp = _PP(plist, int(off), i)
        if pp.pos > end:
            end = pp.pos
        pps.append(pp)
    heap = [(pp.key(), pp) for pp in pps]
    heapq.heapify(heap)

    state = {"end": end, "positioned": True, "match_length": 1 << 62}

    def advance_pp(pp: _PP) -> bool:
        if pp.k >= len(pp.plist):
            return False
        pp.pos = int(pp.plist[pp.k]) - pp.off
        pp.k += 1
        if pp.pos > state["end"]:
            state["end"] = pp.pos
        return True

    def next_match() -> bool:
        if not state["positioned"]:
            return False
        _, pp = heapq.heappop(heap)
        state["match_length"] = state["end"] - pp.pos
        nxt = heap[0][1].pos
        while advance_pp(pp):
            if pp.pos > nxt:  # done minimizing current match-length
                heapq.heappush(heap, (pp.key(), pp))
                if state["match_length"] <= slop:
                    return True
                _, pp = heapq.heappop(heap)
                nxt = heap[0][1].pos
                state["match_length"] = state["end"] - pp.pos
            else:
                ml2 = state["end"] - pp.pos
                if ml2 < state["match_length"]:
                    state["match_length"] = ml2
        state["positioned"] = False
        return state["match_length"] <= slop

    lengths: list[int] = []
    while next_match():
        lengths.append(int(state["match_length"]))
    return lengths


def sloppy_phrase_freq(
    pos_lists: list, offsets: list[int], slop: int
) -> float:
    """Per-document sloppy phrase frequency (float32 value as Python float);
    0.0 when the document has no slop-valid match. Float accumulation in
    match order (``search/PhraseScorer.java:76-79``) over the integer
    match-length sequence."""
    lengths = sloppy_phrase_match_lengths(pos_lists, offsets, slop)
    if not lengths:
        return 0.0
    freq = np.float32(0.0)
    for ml in lengths:
        freq = np.float32(freq + np.float32(1.0) / (np.float32(1.0) + np.float32(ml)))
    return float(freq)
