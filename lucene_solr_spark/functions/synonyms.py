"""Index-time synonym injection — the SynonymGraphFilter role
(``analysis/common/src/java/org/apache/lucene/analysis/synonym/
SynonymGraphFilter.java``) for the single-token expand case: every
occurrence of a source term additionally emits its synonym terms at the
SAME position (posIncr = 0 — a stacked token).

Norm semantics downstream (operators.index_build): stacked tokens are
overlaps — ``FieldInvertState.numOverlap`` counts posIncr==0 tokens and
BM25's default ``discountOverlaps`` norms by ``length − numOverlap``
(``BM25Similarity.java:138-148``), so injected tokens contribute to tf /
totalTermFreq but NOT to the document's norm length. The inversion
kernel tracks this via a per-posting overlap-tf column.

Scope: single-token → single-token expansion (the dominant analyzer
use). Multi-word graph paths (``SynonymGraphFilter``'s posLength > 1
side-paths) are out of scope — noted divergence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["inject_synonyms"]


def inject_synonyms(
    doc_idx: np.ndarray,
    terms,
    pos: np.ndarray,
    synonyms: dict,
):
    """(doc_idx, terms, pos) → the stream plus stacked synonym tokens.

    ``synonyms``: {source_term: (alt_term, ...)}. Returns
    ``(doc_idx', terms', pos', overlap')`` where ``overlap'`` marks the
    injected (posIncr = 0) tokens. Vectorized: one dictionary-encode of
    the batch, then per map entry a mask + gather — per-token Python
    never runs.
    """
    doc_idx = np.asarray(doc_idx, np.int64)
    pos = np.asarray(pos)
    if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = pa.array(list(terms), pa.string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()

    out_doc = [doc_idx]
    out_terms = [terms]
    out_pos = [pos]
    out_ovl = [np.zeros(len(doc_idx), bool)]
    if len(doc_idx):
        denc = pc.dictionary_encode(terms)
        codes = np.asarray(denc.indices, dtype=np.int64)
        code_of = {t: i for i, t in enumerate(denc.dictionary.to_pylist())}
        for src, alts in synonyms.items():
            c = code_of.get(src)
            if c is None:
                continue
            sel = np.nonzero(codes == c)[0]
            if len(sel) == 0:
                continue
            for alt in alts if not isinstance(alts, str) else (alts,):
                out_doc.append(doc_idx[sel])
                out_terms.append(pa.array([alt] * len(sel), pa.string()))
                out_pos.append(pos[sel])
                out_ovl.append(np.ones(len(sel), bool))
    return (
        np.concatenate(out_doc),
        pa.concat_arrays(
            [t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t for t in out_terms]
        ),
        np.concatenate(out_pos),
        np.concatenate(out_ovl),
    )
