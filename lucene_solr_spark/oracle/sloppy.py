"""Sloppy-phrase matching kernel — reference semantics re-expressed.

Mirrors ``search/SloppyPhraseMatcher.java`` including repeated query
terms:

- per-term adjusted positions ``position - queryOffset``
  (``search/PhrasePositions.java:51-58``) so an exact match aligns all pps;
- a priority queue ordered by (position, offset, ord)
  (``search/PhraseQueue.java:27-39``);
- ``nextMatch`` (``SloppyPhraseMatcher.java:174-206``): pop the least pp,
  ``matchLength = end - pp.position``, advance it past the queue top while
  minimizing matchLength, declare a match when ``matchLength <= slop``;
- per-match weight ``1f / (1f + matchLength)`` (``:169-171``), accumulated
  in FLOAT across matches (``search/PhraseScorer.java:76-79``), and the
  resulting float freq feeds BM25 unchanged;
- REPEATED TERMS (``initComplex`` path, ``:395-403``): pps of the same
  term form a repetition group sorted by query offset
  (``gatherRptGroups``/``sortRptGroups``, ``:532-587``); at doc start the
  j-th group member is advanced j occurrences so no two group members sit
  on the same document position (``advanceRepeatGroups`` simple branch,
  ``:455-463``); during matching, a collision created by advancing a
  repeater is resolved by advancing the lesser of the two colliding pps
  and re-queuing the affected members (``advanceRpts``/``collide``/
  ``lesser``, ``:286-344``).

Repetition groups are detected from the content of the position lists
(two pps of the same term share one postings list), or from an explicit
``terms`` argument. MULTI-term repeats (MultiPhraseQuery slots that share
a term — Lucene's ``hasMultiTermRpts`` machinery) take the union-group
path: repetition groups are the connected components of the bipartite
pp↔repeating-term graph (``gatherRptGroups`` MTP branch ``:562-585``,
``ppTermsBitSets``/``unionTermGroups``/``termGroups`` ``:628-680``), and
doc-start placement resolves collisions iteratively instead of the
fixed j-step advance (``advanceRepeatGroups`` MTP branch ``:436-454``).

The same kernel drives the single-node oracle, the DataFrame executor's
pandas UDF, and the segment search kernel, so all three agree by
construction.
"""

from __future__ import annotations

import numpy as np

__all__ = ["sloppy_phrase_freq", "sloppy_phrase_match_lengths"]


class _PhraseQueue:
    """Faithful port of ``util/PriorityQueue.java`` (1-indexed binary heap,
    upHeap :238-249 / downHeap :251-269) with PhraseQueue's lessThan
    (``search/PhraseQueue.java:27-39``: position, then offset, then ord).

    The port matters because the matcher MUTATES a queued pp's position
    during repeat-collision resolution (``advanceRpts`` :286-323) and only
    re-queues SOME members — the queue's state afterwards is
    implementation-defined, so scoring parity requires the same array
    layout and sift order as the reference, not just any heap."""

    __slots__ = ("heap", "size")

    def __init__(self, max_size: int):
        self.heap: list = [None] * (max_size + 1)
        self.size = 0

    @staticmethod
    def _less(a: "_PP", b: "_PP") -> bool:
        if a.pos == b.pos:
            if a.off == b.off:
                return a.ord < b.ord
            return a.off < b.off
        return a.pos < b.pos

    def add(self, element: "_PP") -> None:
        self.size += 1
        self.heap[self.size] = element
        self._up(self.size)

    def top(self) -> "_PP":
        return self.heap[1]

    def pop(self) -> "_PP":
        if self.size > 0:
            result = self.heap[1]
            self.heap[1] = self.heap[self.size]
            self.heap[self.size] = None
            self.size -= 1
            self._down(1)
            return result
        return None

    def clear(self) -> None:
        for i in range(self.size + 1):
            self.heap[i] = None
        self.size = 0

    def _up(self, orig: int) -> None:
        heap = self.heap
        i = orig
        node = heap[i]
        j = i >> 1
        while j > 0 and self._less(node, heap[j]):
            heap[i] = heap[j]
            i = j
            j >>= 1
        heap[i] = node

    def _down(self, i: int) -> None:
        heap, size = self.heap, self.size
        node = heap[i]
        j = i << 1
        k = j + 1
        if k <= size and self._less(heap[k], heap[j]):
            j = k
        while j <= size and self._less(heap[j], node):
            heap[i] = heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= size and self._less(heap[k], heap[j]):
                j = k
        heap[i] = node


class _PP:
    """PhrasePositions (search/PhrasePositions.java): one postings cursor
    per query-phrase slot; ``pos`` is the offset-adjusted position."""

    __slots__ = ("plist", "k", "off", "ord", "pos", "rpt_group", "rpt_ind")

    def __init__(self, plist, off, ord_):
        self.plist = plist
        self.off = off
        self.ord = ord_
        self.k = 1
        self.pos = int(plist[0]) - off
        self.rpt_group = -1
        self.rpt_ind = -1

    def next_position(self) -> bool:
        if self.k >= len(self.plist):
            return False
        self.pos = int(self.plist[self.k]) - self.off
        self.k += 1
        return True


def _lesser(a: _PP, b: _PP) -> _PP:
    """SloppyPhraseMatcher.lesser (:326-331): by (position, offset)."""
    if a.pos < b.pos or (a.pos == b.pos and a.off < b.off):
        return a
    return b


def _group_key(plist, term):
    if term is not None:
        return ("t", term)
    arr = np.asarray(plist)
    return ("c", arr.tobytes())


def sloppy_phrase_match_lengths(
    pos_lists: list, offsets: list[int], slop: int, terms: list | None = None
) -> list[int]:
    """The sequence of match lengths the greedy matcher accepts
    (``matchLength <= slop`` at ``SloppyPhraseMatcher.java:189``), in match
    order. ``sloppy_phrase_freq`` is the float32 fold of this list; the
    integer list itself is the exactly-SQL-gateable artifact (for the
    2-term case the sequence has a closed alternating-successor form —
    see __spark_entry__.oracle_sql['sloppy_phrase_matches']).

    ``pos_lists[i]`` = sorted absolute positions of term i in the doc;
    ``offsets[i]`` = the term's position in the query phrase.
    ``terms[i]`` (optional) identifies slot i's term for repetition
    grouping — a ``frozenset`` for MultiPhrase slots (any two distinct
    multi-term slots sharing a term are rejected); when omitted, slots
    sharing ONE positions list content are grouped (plain repeated terms).
    """
    if len(set(offsets)) != len(offsets):
        raise ValueError("duplicate phrase offsets")

    pps = []
    for i, (plist, off) in enumerate(zip(pos_lists, offsets)):
        if len(plist) == 0:
            return []
        pps.append(_PP(plist, int(off), i))

    # --- repetition-group discovery (gatherRptGroups, :532-587) ----------
    groups: list[list[_PP]] = []
    slot_terms: list[frozenset] | None = None
    has_mtp = False
    if terms is not None:
        slot_terms = [
            t if isinstance(t, frozenset) else frozenset([t]) for t in terms
        ]
        # repeatingTerms (:595-607): a term appearing in >= 2 slots repeats
        tcnt: dict = {}
        for ts in slot_terms:
            for t in ts:
                tcnt[t] = tcnt.get(t, 0) + 1
        rpt_terms = frozenset(t for t, c in tcnt.items() if c >= 2)
        # repeatingPPs (:610-622): hasMultiTermRpts |= a repeating pp is a
        # multi-term slot (:616) — then ALL repeat groups take the union
        # machinery, single-term repeaters included
        rpp = [pp for pp in pps if slot_terms[pp.ord] & rpt_terms]
        has_mtp = any(len(slot_terms[pp.ord]) > 1 for pp in rpp)
    if has_mtp:
        # MTP branch (:562-585): repetition groups = connected components
        # of the bipartite pp↔repeating-term graph. ppTermsBitSets
        # (:628-642) is each pp's repeating-term set; unionTermGroups
        # (:648-663) merges intersecting sets until disjoint (a pp's own
        # set already connects all its repeating terms, so every pp lands
        # in exactly one component).
        bb: list[set] = [set(slot_terms[pp.ord] & rpt_terms) for pp in rpp]
        i = 0
        while i < len(bb) - 1:
            incr = 1
            j = i + 1
            while j < len(bb):
                if bb[i] & bb[j]:
                    bb[i] |= bb[j]
                    del bb[j]
                    incr = 0
                else:
                    j += 1
            i += incr
        member_lists: list[list[_PP]] = [[] for _ in bb]
        for pp in rpp:
            for gi, gterms in enumerate(bb):
                if slot_terms[pp.ord] & gterms:
                    member_lists[gi].append(pp)
                    pp.rpt_group = gi
                    break
        # sortRptGroups (:512-529): by query offset, rpt_ind = index
        for members in member_lists:
            members.sort(key=lambda p: p.off)
            for j, pp in enumerate(members):
                pp.rpt_ind = j
        groups = member_lists
    else:
        # non-MTP gather (:536-561): single-term repeats, grouped by term
        # (or by positions-list content when terms are not given)
        by_key: dict = {}
        for i, pp in enumerate(pps):
            t = slot_terms[i] if slot_terms is not None else None
            if isinstance(t, frozenset):
                if len(t) > 1:
                    continue  # multi-term slot sharing no repeated term
                t = next(iter(t))
            by_key.setdefault(_group_key(pp.plist, t), []).append(pp)
        for members in by_key.values():
            if len(members) > 1:
                # sortRptGroups (:512-529): sort by query offset, index
                members.sort(key=lambda p: p.off)
                g = len(groups)
                for j, pp in enumerate(members):
                    pp.rpt_group = g
                    pp.rpt_ind = j
                groups.append(members)
    has_rpts = bool(groups)

    end = -(1 << 62)
    state = {"end": end, "positioned": True, "match_length": 1 << 62}

    def advance_pp(pp: _PP) -> bool:
        """advancePP (:271-279): step + maintain the global end."""
        if not pp.next_position():
            return False
        if pp.pos > state["end"]:
            state["end"] = pp.pos
        return True

    def collide(pp: _PP) -> int:
        """collide (:334-344): group index of a same-position twin."""
        tp = pp.pos + pp.off
        for pp2 in groups[pp.rpt_group]:
            if pp2 is not pp and pp2.pos + pp2.off == tp:
                return pp2.rpt_ind
        return -1

    # --- advanceRepeatGroups (:435-467) ---------------------------------
    for rg in groups:
        if has_mtp:
            # multi-term branch (:437-454): members may or may not collide
            # ("hidden collisions" — two union-postings slots on the same
            # document position); resolve each in turn by advancing the
            # lesser colliding pp until the group is collision-free
            i = 0
            while i < len(rg):
                incr = 1
                pp = rg[i]
                while True:
                    k = collide(pp)
                    if k < 0:
                        break
                    pp2 = _lesser(pp, rg[k])
                    if not advance_pp(pp2):
                        return []  # PPs exhausted — doc cannot match
                    if pp2.rpt_ind < i:  # "should not happen?" (:449-452)
                        incr = 0
                        break
                i += incr
        else:
            # simple branch (:455-463): the j-th member of an offset-sorted
            # group starts on the term's (j+1)-th occurrence
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return []  # PPs exhausted — doc cannot match

    # fillQueue (:413-421): add in phrasePositions (ord) order
    pq = _PhraseQueue(len(pps))
    for pp in pps:
        if pp.pos > state["end"]:
            state["end"] = pp.pos
        pq.add(pp)

    def advance_rpts(pp: _PP) -> bool:
        """advanceRpts (:286-323): resolve the (single) collision created
        by advancing ``pp`` by advancing the lesser of the two colliding
        pps; re-queue every queue member whose position changed."""
        if pp.rpt_group < 0:
            return True
        rg = groups[pp.rpt_group]
        marked: set[int] = set()
        k0 = pp.rpt_ind
        k = collide(pp)
        while k >= 0:
            pp = _lesser(pp, rg[k])
            if not advance_pp(pp):
                return False
            if k != k0:
                marked.add(k)
            k = collide(pp)
        # re-queue (mirrors the FixedBitSet/rptStack dance :304-321,
        # including keying by rpt_ind alone — no group check, exactly like
        # the reference): pop until every marked index was seen, then push
        # the popped pps back in reverse pop order
        stack: list[_PP] = []
        pending = set(marked)
        while pending:
            pp2 = pq.pop()
            stack.append(pp2)
            if pp2.rpt_group >= 0 and pp2.rpt_ind in pending:
                pending.discard(pp2.rpt_ind)
        for pp2 in reversed(stack):
            pq.add(pp2)
        return True

    def next_match() -> bool:
        """nextMatch (:174-206)."""
        if not state["positioned"]:
            return False
        pp = pq.pop()
        state["match_length"] = state["end"] - pp.pos
        nxt = pq.top().pos
        while advance_pp(pp):
            if has_rpts and not advance_rpts(pp):
                break  # pps exhausted
            if pp.pos > nxt:  # done minimizing current match-length
                pq.add(pp)
                if state["match_length"] <= slop:
                    return True
                pp = pq.pop()
                nxt = pq.top().pos
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
    pos_lists: list, offsets: list[int], slop: int, terms: list | None = None
) -> float:
    """Per-document sloppy phrase frequency (float32 value as Python float);
    0.0 when the document has no slop-valid match. Float accumulation in
    match order (``search/PhraseScorer.java:76-79``) over the integer
    match-length sequence."""
    lengths = sloppy_phrase_match_lengths(pos_lists, offsets, slop, terms)
    if not lengths:
        return 0.0
    freq = np.float32(0.0)
    for ml in lengths:
        freq = np.float32(freq + np.float32(1.0) / (np.float32(1.0) + np.float32(ml)))
    return float(freq)
