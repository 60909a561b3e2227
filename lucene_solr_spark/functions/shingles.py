"""ShingleFilter — token n-grams over the analysis chain
(``analysis/common/src/java/org/apache/lucene/analysis/shingle/
ShingleFilter.java``), vectorized over the batch tokenizer's flat
(doc_idx, terms, pos) arrays (no per-token Python).

Reference semantics pinned by ``TestShingleFilter.java``:

- a shingle joins ``n`` consecutive stream SLOTS with the token
  separator (default ``" "``), ``min_size ≤ n ≤ max_size``
  (``ShingleFilter.java:56, 89-92``);
- position-increment holes (stop-filtered / overlong tokens) are
  materialized as filler ``"_"`` slots (``:38-44``); shingles may start
  or end at a filler (``"this _ _"``, ``"_ _ sentence"`` —
  ``TestShingleFilter.java:600-631``) but a window with NO real token is
  never emitted (trailing ``"_ _"`` never appears —
  ``testTwoTrailingHoles:1294``);
- trailing holes exist only if the caller knows the original stream
  length (Lucene's end-of-stream posIncr) — pass ``doc_end_pos``;
- unigrams: real tokens pass through (``outputUnigrams``, ``:83``);
  fillers are never unigrams (a 1-window of a filler has no real token);
- a shingle's position is its window's start slot.

The transform is pure array work: one slot-expansion scatter, then per
``n`` one ``pyarrow.compute.binary_join_element_wise`` over shifted
slices plus a cumulative-sum window test — the whole batch shingles in
a handful of vector ops, preserving the tokenizer kernel's
no-per-row-Python contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["add_shingles", "DEFAULT_FILLER", "DEFAULT_SEPARATOR"]

DEFAULT_FILLER = "_"  # ShingleFilter.DEFAULT_FILLER_TOKEN
DEFAULT_SEPARATOR = " "  # ShingleFilter.DEFAULT_TOKEN_SEPARATOR


def add_shingles(
    doc_idx: np.ndarray,
    terms,
    pos: np.ndarray,
    *,
    n_docs: int | None = None,
    min_size: int = 2,
    max_size: int = 2,
    sep: str = DEFAULT_SEPARATOR,
    filler: str = DEFAULT_FILLER,
    output_unigrams: bool = True,
    doc_end_pos: np.ndarray | None = None,
):
    """(doc_idx, terms, pos) token stream → the stream with shingles.

    ``doc_idx``: int64 per-token document row index (monotone
    nondecreasing, as produced by ``fast_tokenizer.batch_tokenize``);
    ``terms``: arrow string array; ``pos``: int32 positions (gaps =
    holes). ``doc_end_pos[d]`` (optional) = the original stream length of
    doc ``d``, materializing trailing holes. Returns the same triple with
    shingle tokens appended (shingles sort after unigrams; downstream
    postings aggregation is order-insensitive).
    """
    if min_size < 2 or max_size < min_size:
        raise ValueError("need 2 <= min_size <= max_size")
    doc_idx = np.asarray(doc_idx, np.int64)
    pos = np.asarray(pos, np.int64)
    if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = pa.array(list(terms), pa.string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if n_docs is None:
        n_docs = int(doc_idx.max()) + 1 if len(doc_idx) else 0

    # --- slot expansion: one slot per stream position, fillers in holes
    slots_per_doc = np.zeros(n_docs, np.int64)
    if len(doc_idx):
        np.maximum.at(slots_per_doc, doc_idx, pos + 1)
    if doc_end_pos is not None:
        slots_per_doc = np.maximum(slots_per_doc, np.asarray(doc_end_pos, np.int64))
    offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(slots_per_doc, out=offsets[1:])
    total = int(offsets[-1])

    slot_term_idx = np.full(total, -1, np.int64)  # -1 = filler
    slot_term_idx[offsets[doc_idx] + pos] = np.arange(len(doc_idx))
    real = slot_term_idx >= 0
    # filler slots read term index 0 then get masked to the filler string
    slot_terms = terms.take(pa.array(np.where(real, slot_term_idx, 0)))
    if total and not real.all():
        slot_terms = pc.if_else(pa.array(real), slot_terms, pa.scalar(filler))
    slot_doc = np.repeat(np.arange(n_docs, dtype=np.int64), slots_per_doc)
    slot_pos = np.arange(total, dtype=np.int64) - offsets[slot_doc]
    real_csum = np.zeros(total + 1, np.int64)
    np.cumsum(real, out=real_csum[1:])

    out_doc = [doc_idx] if output_unigrams else [np.empty(0, np.int64)]
    out_terms = [terms] if output_unigrams else [pa.array([], pa.string())]
    out_pos = [pos] if output_unigrams else [np.empty(0, np.int64)]

    for n in range(min_size, max_size + 1):
        if total < n:
            break
        starts = np.arange(total - n + 1, dtype=np.int64)
        # window stays inside one doc and holds >= 1 real token
        keep = (slot_doc[starts] == slot_doc[starts + n - 1]) & (
            real_csum[starts + n] - real_csum[starts] > 0
        )
        s = starts[keep]
        if len(s) == 0:
            continue
        parts = [slot_terms.take(pa.array(s + j)) for j in range(n)]
        out_terms.append(pc.binary_join_element_wise(*parts, sep))
        out_doc.append(slot_doc[s])
        out_pos.append(slot_pos[s])

    return (
        np.concatenate(out_doc),
        pa.concat_arrays(
            [t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t for t in out_terms]
        ),
        np.concatenate(out_pos).astype(np.int32),
    )
