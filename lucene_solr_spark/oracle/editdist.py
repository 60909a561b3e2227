"""Edit distances for fuzzy matching.

``osa_distance`` is the optimal-string-alignment (restricted Damerau)
distance — a transposition of two adjacent characters counts as ONE edit,
matching Lucene's default ``FuzzyQuery`` semantics (``transpositions=true``,
``search/FuzzyQuery.java:46-48``; the Levenshtein automata are built with
the transposition primitive, ``util/automaton/LevenshteinAutomata.java``).
``levenshtein_distance`` is the classic metric (``transpositions=false``).

``fuzzy_boost`` mirrors ``FuzzyTermsEnum.AutomatonFuzzyTermsEnum.accept``
(``search/FuzzyTermsEnum.java:249-256``): boost 1.0 for an exact match,
else ``1 - ed / min(|candidate|, |query|)`` (code points; both full terms
including any required prefix).
"""

from __future__ import annotations

import numpy as np

__all__ = ["osa_distance", "levenshtein_distance", "fuzzy_boost", "osa_batch"]


def levenshtein_distance(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


def osa_distance(a: str, b: str) -> int:
    """Restricted-Damerau (adjacent transposition = 1 edit)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and ca == b[j - 2] and a[i - 2] == b[j - 1]:
                t = d[i - 2][j - 2] + 1
                if t < v:
                    v = t
            d[i][j] = v
    return d[la][lb]


def osa_batch(terms, query: str, max_edits: int) -> np.ndarray:
    """OSA distance of each term to ``query``, with the cheap exactness-
    preserving length-band shortcut (|len diff| > max_edits can never be
    within max_edits): those entries return max_edits + 1 without running
    the DP. int32 array."""
    lq = len(query)
    out = np.empty(len(terms), np.int32)
    for i, t in enumerate(terms):
        if abs(len(t) - lq) > max_edits:
            out[i] = max_edits + 1
        else:
            out[i] = osa_distance(t, query)
    return out


def fuzzy_boost(term: str, query: str, ed: int) -> float:
    """FuzzyTermsEnum boost (double form; callers round to float32 for the
    Lucene-parity chain)."""
    if ed == 0:
        return 1.0
    return 1.0 - ed / min(len(term), len(query))
