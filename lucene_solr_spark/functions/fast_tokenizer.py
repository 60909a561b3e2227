"""Vectorized batch tokenizer — the index-build hot path.

Semantics: EXACTLY ``oracle.tokenizer.analyze`` (StandardAnalyzer chain;
``analysis/standard/StandardTokenizerImpl.jflex:95-112,225-265`` rules as
re-expressed there), but computed over a WHOLE Arrow batch at once:

- all ASCII documents are concatenated into one byte buffer; character
  classes come from 256-entry lookup tables; a mid-char (``. : ' , ;``)
  joins iff its neighbors are letters (MidLetter/MidNumLet) or digits
  (MidNum/MidNumLet) — evaluated as shifted boolean masks; token runs are
  diff-detected; token text is ONE numpy gather + an Arrow
  ``StringArray.from_buffers`` (zero per-token Python objects);
- documents containing any non-ASCII character (CJK, emoji, U+2019 …)
  take the per-document oracle kernel — the exact same code the parity
  goldens pin — so the fast path never changes semantics, only speed.

For ASCII input the run rule is provably equivalent to the oracle's
regex+split: a mid-char with an invalid neighbor splits the run exactly
where ``_split_candidate`` splits the regex candidate, and consecutive
mid-chars never join (the neighbor is then a mid-char, which is neither
letter nor digit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_solr_spark.oracle.tokenizer import MAX_TOKEN_LENGTH_DEFAULT, analyze

__all__ = ["batch_tokenize"]

# ------------------------------------------------------------- class LUTs
_WORD = np.zeros(256, np.bool_)
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_":
    _WORD[_c] = True
_LETTER = np.zeros(256, np.bool_)
for _c in b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
    _LETTER[_c] = True
_DIGIT = np.zeros(256, np.bool_)
for _c in b"0123456789":
    _DIGIT[_c] = True
_MID_L = np.zeros(256, np.bool_)  # MidLetter ∪ MidNumLet ∪ ' (letter ctx)
for _c in b".:'":
    _MID_L[_c] = True
_MID_N = np.zeros(256, np.bool_)  # MidNum ∪ MidNumLet ∪ ' (digit ctx)
for _c in b".,;'":
    _MID_N[_c] = True
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[ord("A") : ord("Z") + 1] += 32


def _shift_prev(a: np.ndarray) -> np.ndarray:
    out = np.empty_like(a)
    out[0] = False
    out[1:] = a[:-1]
    return out


def _shift_next(a: np.ndarray) -> np.ndarray:
    out = np.empty_like(a)
    out[-1] = False
    out[:-1] = a[1:]
    return out


def _ascii_kernel(
    texts: list[str],
    lowercase: bool,
    max_token_length: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized tokenize of ASCII docs.

    Returns (doc_idx:int64, starts, lengths, pos:int32) in token order plus
    the (possibly lowercased) byte buffer via attributes — see caller."""
    raise NotImplementedError  # replaced below; kept for readability


def batch_tokenize(
    texts,
    *,
    lowercase: bool = True,
    stopwords: frozenset[str] = frozenset(),
    max_token_length: int = MAX_TOKEN_LENGTH_DEFAULT,
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Tokenize a batch of documents.

    ``texts``: sequence of str|None (one per document).
    Returns ``(doc_idx, terms, pos)``: int64 row index into ``texts`` per
    token, an Arrow string array of (lowercased, stop-filtered) terms, and
    int32 positions with stop/overlong gaps preserved.
    """
    ascii_texts: list[str] = []
    ascii_rows: list[int] = []
    slow_rows: list[int] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        if t.isascii():
            ascii_rows.append(i)
            ascii_texts.append(t)
        else:
            slow_rows.append(i)

    out_doc: list[np.ndarray] = []
    out_terms: list[pa.Array] = []
    out_pos: list[np.ndarray] = []

    if ascii_texts:
        buf = "\n".join(ascii_texts).encode("ascii")
        b = np.frombuffer(buf, np.uint8)
        # doc start offset of each ascii doc inside buf
        lens = np.fromiter((len(t) for t in ascii_texts), np.int64, len(ascii_texts))
        doc_off = np.zeros(len(ascii_texts) + 1, np.int64)
        np.cumsum(lens + 1, out=doc_off[1:])  # +1 for the '\n' separators

        is_word = _WORD[b]
        is_letter = _LETTER[b]
        is_digit = _DIGIT[b]
        join_l = _MID_L[b] & _shift_prev(is_letter) & _shift_next(is_letter)
        join_n = _MID_N[b] & _shift_prev(is_digit) & _shift_next(is_digit)
        tok = is_word | join_l | join_n

        d = np.diff(np.r_[np.int8(0), tok.view(np.int8), np.int8(0)])
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        if starts.size:
            tlen = ends - starts
            # doc of each token; separators are non-word so runs never span
            doc_idx_local = np.searchsorted(doc_off, starts, side="right") - 1
            # 0-based position within doc over ALL raw tokens
            first = np.r_[True, doc_idx_local[1:] != doc_idx_local[:-1]]
            tok_seq = np.arange(starts.size, dtype=np.int64)
            pos = (tok_seq - tok_seq[first][np.cumsum(first) - 1]).astype(np.int32)

            keep = tlen <= max_token_length  # skip-with-position
            starts, tlen = starts[keep], tlen[keep]
            doc_idx_local, pos = doc_idx_local[keep], pos[keep]

            data = _LOWER[b] if lowercase else b
            # single gather of all token bytes
            total = int(tlen.sum())
            cum = np.zeros(len(tlen), np.int64)
            np.cumsum(tlen[:-1], out=cum[1:])
            gather = np.arange(total, dtype=np.int64) - np.repeat(cum, tlen) + np.repeat(
                starts, tlen
            )
            tbytes = data[gather].tobytes()
            offsets = np.zeros(len(tlen) + 1, np.int32)
            np.cumsum(tlen, out=offsets[1:].view(np.int32)[: len(tlen)])
            terms = pa.Array.from_buffers(
                pa.utf8(),
                len(tlen),
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(tbytes)],
            )
            if stopwords:
                m = pa.compute.is_in(
                    terms, value_set=pa.array(sorted(stopwords), pa.utf8())
                )
                m = pa.compute.fill_null(m, False)
                keep2 = np.invert(m.to_numpy(zero_copy_only=False))
                terms = terms.filter(pa.array(keep2))
                doc_idx_local = doc_idx_local[keep2]
                pos = pos[keep2]
            ascii_map = np.asarray(ascii_rows, np.int64)
            out_doc.append(ascii_map[doc_idx_local])
            out_terms.append(terms)
            out_pos.append(pos)

    for i in slow_rows:
        toks = analyze(
            texts[i],
            lowercase=lowercase,
            stopwords=stopwords,
            max_token_length=max_token_length,
        )
        if not toks:
            continue
        out_doc.append(np.full(len(toks), i, np.int64))
        out_terms.append(pa.array([t.term for t in toks], pa.utf8()))
        out_pos.append(np.fromiter((t.pos for t in toks), np.int32, len(toks)))

    if not out_doc:
        return (
            np.empty(0, np.int64),
            pa.array([], pa.utf8()),
            np.empty(0, np.int32),
        )
    return (
        np.concatenate(out_doc),
        pa.concat_arrays(out_terms) if len(out_terms) > 1 else out_terms[0],
        np.concatenate(out_pos),
    )
