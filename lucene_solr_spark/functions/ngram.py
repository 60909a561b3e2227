"""NGramTokenFilter / EdgeNGramTokenFilter — character n-grams over the
analysis chain (``analysis/common/src/java/org/apache/lucene/analysis/
ngram/NGramTokenFilter.java`` and ``EdgeNGramTokenFilter.java``),
vectorized over the batch tokenizer's flat (doc_idx, terms, pos) arrays.

Reference semantics (post-4.4 filter contract):

- every gram of one source token is emitted AT THE SAME POSITION: the
  first emission carries the accumulated position increment, the rest
  posIncr 0 (``NGramTokenFilter.java:104-135``, ``EdgeNGramTokenFilter
  .java:95-135``) — in absolute-position terms, all grams sit at the
  source token's position and a token that emits nothing leaves a gap;
- gram bounds count CODE POINTS (``Character.codePointCount``,
  ``NGramTokenFilter.java:107``) — Arrow's utf8 kernels match;
- ``NGramTokenFilter`` emits every substring with
  ``minGram <= len <= maxGram`` (reference order: start offset asc,
  then length asc — order inside a token is immaterial here because all
  grams share one position and the inversion re-sorts);
- ``EdgeNGramTokenFilter`` emits the prefixes with
  ``minGram <= len <= maxGram``;
- ``preserveOriginal``: a token SHORTER than minGram is kept as-is and
  carries the position increment (``:109-115``); a token LONGER than
  maxGram is appended as-is at posIncr 0 (``:136-143``);
- posIncr==0 emissions are ``FieldInvertState.numOverlap`` overlaps —
  BM25's default ``discountOverlaps`` norms by length − numOverlap
  while totalTermFreq / avgdl still count every emission
  (``BM25Similarity.java:114-117,138-148``) — so the expansion returns
  a per-emission overlap flag for the inverter's ``otf`` column.

The transform is pure vector work: one ``utf8_length`` pass, then per
(start, size) pair one boolean mask + one ``utf8_slice_codeunits``
(start/size pairs number ≤ token-length × gram-range, a loop over gram
SHAPES, never over rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ngram_expand"]


def ngram_expand(
    doc_idx: np.ndarray,
    terms,
    pos: np.ndarray,
    *,
    min_gram: int,
    max_gram: int,
    edge: bool = False,
    preserve_original: bool = False,
):
    """(doc_idx, terms, pos) token stream → the gram-expanded stream.

    Returns ``(doc_idx', terms', pos', overlap')`` where ``overlap'`` is
    a uint8 array marking posIncr==0 emissions (every gram of a source
    token except its first — the inverter's norm discount). Emission
    order is NOT the reference's within-token order; callers re-sort by
    (doc, term, pos) as the inversion kernel already does.
    """
    if min_gram < 1:
        raise ValueError("minGram must be greater than zero")
    if min_gram > max_gram:
        raise ValueError("minGram must not be greater than maxGram")
    doc_idx = np.asarray(doc_idx, np.int64)
    pos = np.asarray(pos, np.int64)
    if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = pa.array(list(terms), pa.string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if len(terms) == 0:
        return doc_idx, terms, pos, np.empty(0, np.uint8)

    lens = np.asarray(pc.utf8_length(terms), np.int64)
    max_len = int(lens.max())

    d_parts: list[np.ndarray] = []
    p_parts: list[np.ndarray] = []
    t_parts: list[pa.Array] = []
    o_parts: list[np.ndarray] = []

    def emit(mask: np.ndarray, chunk: pa.Array, overlap: bool) -> None:
        n = int(mask.sum())
        if n == 0:
            return
        d_parts.append(doc_idx[mask])
        p_parts.append(pos[mask])
        t_parts.append(chunk)
        o_parts.append(np.full(n, 1 if overlap else 0, np.uint8))

    # start offsets: 0 only for edge grams, else every viable start
    starts = (0,) if edge else range(0, max(max_len - min_gram, 0) + 1)
    for s in starts:
        for g in range(min_gram, max_gram + 1):
            mask = lens >= s + g
            if not mask.any():
                break  # larger g at this start can't fit either
            chunk = pc.utf8_slice_codeunits(
                terms.filter(pa.array(mask)), s, s + g
            )
            # the token's FIRST emission (reference order: start asc,
            # then length asc) carries the position increment
            emit(mask, chunk, overlap=not (s == 0 and g == min_gram))
    if preserve_original:
        short = lens < min_gram
        if short.any():
            # shorter than minGram: kept, carries the increment
            emit(short, terms.filter(pa.array(short)), overlap=False)
        long = lens > max_gram
        if long.any():
            # longer than maxGram: appended at posIncr 0
            emit(long, terms.filter(pa.array(long)), overlap=True)

    if not d_parts:
        return (
            np.empty(0, np.int64),
            pa.array([], pa.string()),
            np.empty(0, np.int64),
            np.empty(0, np.uint8),
        )
    out_terms = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in t_parts]
    )
    return (
        np.concatenate(d_parts),
        out_terms,
        np.concatenate(p_parts),
        np.concatenate(o_parts),
    )
