"""CommonGramsFilter / CommonGramsQueryFilter — stopword bigrams
(``analysis/common/src/java/org/apache/lucene/analysis/commongrams/
CommonGramsFilter.java`` and ``CommonGramsQueryFilter.java``).

Index side (``CommonGramsFilter.java:98-121,151-171``): every unigram
passes through; each ADJACENT pair (a, b) where a or b is a common word
additionally emits the compound ``a_b`` (separator '_',
``CommonGramsFilter.java:53``) at posIncr 0 right after ``a`` — in the
absolute-position model the gram sits at a's position and is an
overlap (numOverlap) token, discounted from norms like synonym stacks.

Query side (``CommonGramsQueryFilter.java:85-130``): a hold-one-token
automaton that emits bigrams whenever possible and unigrams only when
the mechanics don't absorb them. Pinned quirks (goldens in
``TestCommonGramsFilter.java:87-137``):

- a held unigram is DROPPED when the next stream token is a gram
  (the gram replaces it) — "n s n" → ``n_s s_n``;
- a trailing held unigram is dropped iff the LAST EMITTED token was a
  gram (``previousType`` records the emitted token's type because it is
  read after ``restoreState`` — ``CommonGramsQueryFilter.java:98-103,
  113-115``) — "s n n" keeps the middle n (``s_n n n``) but "n s n"
  drops the trailing n.

The index transform is pure vector work (one is_in mask + one
binary_join over shifted slices); the query automaton is scalar (query
token counts are tiny).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["add_common_grams", "common_grams_query", "SEPARATOR"]

SEPARATOR = "_"  # CommonGramsFilter.java:53


def add_common_grams(
    doc_idx: np.ndarray,
    terms,
    pos: np.ndarray,
    common: frozenset[str],
):
    """(doc_idx, terms, pos) token stream → the stream with common-word
    bigrams appended. Adjacency = consecutive stream rows of one doc
    (the filter joins stream neighbours regardless of increments —
    ``saveTermBuffer`` keeps whatever came last). Returns
    ``(doc_idx', terms', pos', overlap')``; grams are the overlaps."""
    doc_idx = np.asarray(doc_idx, np.int64)
    pos = np.asarray(pos, np.int64)
    if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = pa.array(list(terms), pa.string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    uni_overlap = np.zeros(n, np.uint8)
    if n < 2 or not common:
        return doc_idx, terms, pos, uni_overlap

    common_arr = pa.array(sorted(common), pa.string())
    is_common = np.asarray(pc.is_in(terms, value_set=common_arr))
    a = terms.slice(0, n - 1)
    b = terms.slice(1, n - 1)
    pair = (doc_idx[1:] == doc_idx[:-1]) & (is_common[:-1] | is_common[1:])
    if not pair.any():
        return doc_idx, terms, pos, uni_overlap
    mask = pa.array(pair)
    grams = pc.binary_join_element_wise(
        a.filter(mask), b.filter(mask), SEPARATOR
    )
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    out_terms = pa.concat_arrays([terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms, grams])
    return (
        np.concatenate([doc_idx, doc_idx[:-1][pair]]),
        out_terms,
        np.concatenate([pos, pos[:-1][pair]]),
        np.concatenate([uni_overlap, np.ones(int(pair.sum()), np.uint8)]),
    )


def common_grams_query(terms: list[str], common: frozenset[str]) -> list[str]:
    """Query-side rewrite: the CommonGramsFilter → CommonGramsQueryFilter
    composition over an ordered query token list. Returns the ordered
    output terms (each emitted token advances one position — the filter
    forces gram posIncr back to 1, ``CommonGramsQueryFilter.java:
    99-102``)."""
    # stage 1 (CommonGramsFilter): interleave unigrams and grams in
    # stream order: u0 [g01] u1 [g12] u2 ...
    stream: list[tuple[str, bool]] = []  # (term, is_gram)
    for i, t in enumerate(terms):
        stream.append((t, False))
        if i + 1 < len(terms) and (t in common or terms[i + 1] in common):
            stream.append((t + SEPARATOR + terms[i + 1], True))
    # stage 2 (CommonGramsQueryFilter): hold-one automaton
    out: list[str] = []
    prev: tuple[str, bool] | None = None
    last_emitted_gram = False
    for cur in stream:
        if prev is not None and not cur[1]:
            out.append(prev[0])
            last_emitted_gram = prev[1]
            prev = cur
        else:
            prev = cur  # a gram replaces the held unigram
    # exhaustion (CommonGramsQueryFilter.java:108-115): the held token is
    # dropped iff the LAST EMITTED token was a gram
    if prev is not None and not last_emitted_gram:
        out.append(prev[0])
    return out
