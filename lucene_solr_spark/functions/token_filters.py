"""Miscellaneous token filters — LengthFilter, ReverseStringFilter,
TruncateTokenFilter, CapitalizationFilter, KeywordRepeatFilter (+
RemoveDuplicatesTokenFilter) — over the batch tokenizer's flat arrays
(``analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/
*.java``, ``reverse/ReverseStringFilter.java``).

Specs are ``(kind, *args)`` tuples applied in order:

- ``("length", min, max)`` — LengthFilter (a FilteringTokenFilter:
  dropped tokens leave position gaps). Java measures UTF-16 code units
  (``LengthFilter.java:26``); computed per unique term so supplementary
  characters count 2.
- ``("reverse",)`` — ReverseStringFilter; the reference reverses
  char-wise but keeps surrogate pairs intact
  (``ReverseStringFilter.java:100-130``) ≡ code-point reversal.
- ``("truncate", n)`` — TruncateTokenFilter (fixed-prefix, the Turkish
  F5 stemming method, ``TruncateTokenFilter.java:25-31``). Code-point
  prefix (Java's setLength could split a surrogate pair; we don't).
- ``("capitalize",)`` — CapitalizationFilter with the DEFAULT config
  (onlyFirstWord, forceFirstLetter, no keep/okPrefix/minWordLength —
  ``CapitalizationFilter.java:54-57``), including the boundary-scan
  index-skip quirk (``:118-130``: after a delimiter the scan jumps two
  chars, so of two consecutive delimiters only the first is seen).
- ``("keyword_repeat", stemmer)`` — the KeywordRepeatFilter → stem →
  RemoveDuplicatesTokenFilter composition
  (``KeywordRepeatFilter.java:44-58``, ``RemoveDuplicates…java:47-63``):
  each token emits its original (keyword-marked, so the stemmer skips
  it) and its stem at posIncr 0; the duplicate-removal drops the stack
  when stem == original. The stemmed copy is an overlap (norm
  discount). ``stemmer`` is any ``oracle.light_stemmers.resolve`` name.

Per-term rewrites run per UNIQUE term (dictionary encode); masks and
slices are Arrow kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["apply_token_filters", "capitalize_term"]


def capitalize_term(term: str) -> str:
    """CapitalizationFilter default config, scalar
    (``CapitalizationFilter.java:103-145,146-196``)."""
    buf = list(term)

    def process(start: int, length: int, word_count: int) -> None:
        if length < 1:
            return
        if word_count > 0:  # onlyFirstWord: later words forced lower
            for i in range(start, start + length):
                buf[i] = buf[i].lower()
            return
        buf[start] = buf[start].upper()
        for i in range(start + 1, start + length):
            buf[i] = buf[i].lower()

    word_count = 0
    last_start = 0
    i = 0
    n = len(buf)
    while i < n:
        c = buf[i]
        if c <= " " or c == ".":
            ln = i - last_start
            if ln > 0:
                process(last_start, ln, word_count)
                word_count += 1
                last_start = i + 1
                i += 1  # the reference's extra skip (:125-127)
        i += 1
    if last_start < n:
        process(last_start, n - last_start, word_count)
    return "".join(buf)


def _utf16_len(term: str) -> int:
    n = len(term)
    # count supplementary chars only when present (ascii fast path)
    return n + sum(1 for c in term if ord(c) > 0xFFFF)


def apply_token_filters(doc_idx, terms, pos, specs, overlap=None):
    """Apply the spec chain; returns ``(doc_idx, terms, pos, overlap)``
    where ``overlap`` stays ``None`` unless a stacking spec ran."""
    doc_idx = np.asarray(doc_idx, np.int64)
    pos = np.asarray(pos, np.int64)
    if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = pa.array(list(terms), pa.string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()

    def per_unique(fn):
        nonlocal terms
        if len(terms) == 0:
            return
        denc = pc.dictionary_encode(terms)
        vocab = denc.dictionary.to_pylist()
        mapped = pa.array([fn(t) for t in vocab], pa.string())
        out = mapped.take(denc.indices)
        terms = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    for spec in specs:
        kind = spec[0]
        if kind == "length":
            lo, hi = int(spec[1]), int(spec[2])
            if lo < 0 or lo > hi:
                raise ValueError("need 0 <= min <= max")
            if len(terms) == 0:
                continue
            denc = pc.dictionary_encode(terms)
            vlens = np.array(
                [_utf16_len(t) for t in denc.dictionary.to_pylist()], np.int64
            )
            lens = vlens[np.asarray(denc.indices, np.int64)]
            keep = (lens >= lo) & (lens <= hi)
            doc_idx, pos = doc_idx[keep], pos[keep]
            terms = terms.filter(pa.array(keep))
            if isinstance(terms, pa.ChunkedArray):
                terms = terms.combine_chunks()
            if overlap is not None:
                overlap = overlap[keep]
        elif kind == "reverse":
            out = pc.utf8_reverse(terms)
            terms = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
        elif kind == "truncate":
            n = int(spec[1])
            if n < 1:
                raise ValueError("length parameter must be a positive number")
            out = pc.utf8_slice_codeunits(terms, 0, n)
            terms = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
        elif kind == "capitalize":
            per_unique(capitalize_term)
        elif kind == "keyword_repeat":
            from lucene_solr_spark.oracle.light_stemmers import resolve

            stem = resolve(spec[1])
            if len(terms) == 0:
                continue
            denc = pc.dictionary_encode(terms)
            codes = np.asarray(denc.indices, np.int64)
            vocab = denc.dictionary.to_pylist()
            stems = [stem(t) for t in vocab]
            differs = np.array(
                [s != t for s, t in zip(stems, vocab)], bool
            )
            k = np.where(differs[codes], 2, 1)
            occ = np.repeat(np.arange(len(codes)), k)
            within = np.arange(len(occ)) - np.repeat(np.cumsum(k) - k, k)
            # emission 0 = original (keyword-marked), 1 = stem (overlap)
            stem_map = pa.array(stems, pa.string())
            orig = terms.take(pa.array(occ, pa.int64()))
            stemmed = stem_map.take(pa.array(codes[occ], pa.int64()))
            out = pc.if_else(pa.array(within == 0), orig, stemmed)
            terms = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
            new_ov = (within != 0).astype(np.uint8)
            if overlap is not None:
                new_ov |= overlap[occ]
            overlap = new_ov
            doc_idx, pos = doc_idx[occ], pos[occ]
        else:
            raise ValueError(f"unknown token filter {kind!r}")
    return doc_idx, terms, pos, overlap
