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
- ``("pattern_replace", pattern, replacement, all)`` —
  PatternReplaceFilter (``pattern/PatternReplaceFilter.java``): regex
  replace per token, first-match or all-matches. Executed by Arrow's
  RE2 (``\\1`` backrefs), not Java regex — patterns using Java-only
  syntax (lookbehind) are rejected by RE2 at kernel time.
- ``("pattern_capture", patterns, preserve_original)`` —
  PatternCaptureGroupTokenFilter (``pattern/
  PatternCaptureGroupTokenFilter.java``): every capture-group span of
  every pattern stacks at the token's position, interleaved across
  patterns by start offset (the ``nextCapture`` min-offset walk,
  ``:89-119``); with ``preserve_original`` the original comes first and
  whole-token captures are skipped, without it the first capture
  replaces the original (no captures → original passes).
- ``("dictionary_compound", words, min_word, min_sub, max_sub,
  only_longest)`` — DictionaryCompoundWordTokenFilter
  (``compound/DictionaryCompoundWordTokenFilterBase.java:100-137``,
  ``DictionaryCompoundWordTokenFilter.java:68-96``): the original token
  always passes; every dictionary subword found by the brute-force
  (start × length) scan stacks at posIncr 0 (norm-discounted), longest
  per start when ``only_longest``; tokens shorter than ``min_word``
  skip the scan. Defaults mirror the reference (5/2/15).
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

#: spec kinds that can STACK tokens at one position (their postings
#: carry an ``otf`` overlap column and norms discount the overlaps)
STACKING_SPECS = frozenset(
    {
        "keyword_repeat",
        "pattern_capture",
        "dictionary_compound",
        "phonetic",
        "double_metaphone",
        "daitch_mokotoff",
    }
)

__all__ = [
    "STACKING_SPECS",
    "apply_token_filters",
    "capitalize_term",
    "pattern_captures",
    "dictionary_decompose",
]


def dictionary_decompose(
    term: str,
    words: frozenset[str],
    min_word: int = 5,
    min_sub: int = 2,
    max_sub: int = 15,
    only_longest: bool = False,
    ignore_case: bool = False,
) -> list[tuple[str, bool]]:
    """Scalar DictionaryCompoundWordTokenFilter for one token: the
    original (posIncr kept) then its dictionary subwords (posIncr 0).
    ``ignore_case`` models a CharArraySet(ignoreCase=true) dictionary;
    emitted subwords keep the ORIGINAL slice casing either way."""
    out = [(term, False)]
    n = len(term)
    if n < min_word:
        return out
    key = term.lower() if ignore_case else term
    vocab = {w.lower() for w in words} if ignore_case else words
    for i in range(0, n - min_sub + 1):
        longest = None
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            if key[i : i + j] in vocab:
                if only_longest:
                    longest = term[i : i + j]
                else:
                    out.append((term[i : i + j], True))
        if only_longest and longest is not None:
            out.append((longest, True))
    return out


def pattern_captures(
    term: str, patterns, preserve_original: bool
) -> list[tuple[str, bool]]:
    """Scalar PatternCaptureGroupTokenFilter for one token: ordered
    ``[(text, overlap), ...]`` emissions (first = posIncr>0). Direct
    port of the interleaved min-offset group walk
    (``PatternCaptureGroupTokenFilter.java:89-165``)."""
    import re

    matchers = [re.compile(p) if isinstance(p, str) else p for p in patterns]
    group_counts = [m.groups for m in matchers]
    iters = [m.finditer(term) for m in matchers]
    match = [None] * len(matchers)
    group = [-1] * len(matchers)

    def next_capture():
        # returns (matcher_idx, span) of the minimal-start capture
        best, best_start = -1, None
        i = 0
        while i < len(matchers):
            if group[i] == -1:
                match[i] = next(iters[i], None)
                group[i] = 1 if match[i] is not None else 0
            if group[i] != 0:
                while group[i] < group_counts[i] + 1:
                    start, end = match[i].span(group[i])
                    if start == end or (
                        preserve_original and start == 0 and end == len(term)
                    ):
                        group[i] += 1
                        continue
                    if best_start is None or start < best_start:
                        best_start, best = start, i
                    break
                if group[i] == group_counts[i] + 1:
                    group[i] = -1
                    continue  # same matcher, next find (the Java i--)
            i += 1
        return best

    out: list[tuple[str, bool]] = []
    if preserve_original:
        out.append((term, False))
    else:
        i = next_capture()
        if i == -1:
            return [(term, False)]
        s, e = match[i].span(group[i])
        out.append((term[s:e], False))
        group[i] += 1
    while True:
        i = next_capture()
        if i == -1:
            return out
        s, e = match[i].span(group[i])
        out.append((term[s:e], True))
        group[i] += 1


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
        elif kind == "icu_folding":
            from lucene_solr_spark.oracle.icu_fold import icu_fold

            per_unique(icu_fold)
        elif kind == "icu_normalize":
            from lucene_solr_spark.oracle.icu_fold import icu_normalize

            per_unique(icu_normalize)
        elif kind == "pattern_replace":
            pat, repl, all_ = spec[1], spec[2], bool(spec[3])
            out = pc.replace_substring_regex(
                terms,
                pattern=pat,
                replacement="" if repl is None else repl,
                max_replacements=None if all_ else 1,
            )
            terms = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
        elif kind in (
            "pattern_capture",
            "dictionary_compound",
            "phonetic",
            "double_metaphone",
            "daitch_mokotoff",
        ):
            if len(terms) == 0:
                continue
            denc = pc.dictionary_encode(terms)
            codes = np.asarray(denc.indices, np.int64)
            vocab = denc.dictionary.to_pylist()
            if kind == "pattern_capture":
                pats, preserve = spec[1], bool(spec[2])
                ems = [pattern_captures(t, pats, preserve) for t in vocab]
            elif kind == "phonetic":
                from lucene_solr_spark.oracle.phonetic import ENCODERS

                enc, inject = ENCODERS[spec[1]], bool(spec[2])
                ems = [phonetic_emissions(t, enc, inject) for t in vocab]
            elif kind == "double_metaphone":
                max_len, inject = int(spec[1]), bool(spec[2])
                ems = [
                    double_metaphone_emissions(t, max_len, inject)
                    for t in vocab
                ]
            elif kind == "daitch_mokotoff":
                inject = bool(spec[1])
                ems = [daitch_mokotoff_emissions(t, inject) for t in vocab]
            else:
                words = frozenset(spec[1])
                mw, ms, xs = (
                    (int(spec[2]), int(spec[3]), int(spec[4]))
                    if len(spec) > 4
                    else (5, 2, 15)
                )
                longest = bool(spec[5]) if len(spec) > 5 else False
                ign = bool(spec[6]) if len(spec) > 6 else False
                ems = [
                    dictionary_decompose(t, words, mw, ms, xs, longest, ign)
                    for t in vocab
                ]
            vtexts, vov, voff = [], [], [0]
            for e in ems:
                for t, ov in e:
                    vtexts.append(t)
                    vov.append(1 if ov else 0)
                voff.append(len(vtexts))
            k = np.diff(np.array(voff, np.int64))[codes]
            occ = np.repeat(np.arange(len(codes)), k)
            within = np.arange(len(occ)) - np.repeat(np.cumsum(k) - k, k)
            vidx = np.array(voff, np.int64)[codes[occ]] + within
            out = pa.array(vtexts, pa.string()).take(
                pa.array(vidx, pa.int64())
            )
            terms = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
            new_ov = np.array(vov, np.uint8)[vidx]
            if overlap is not None:
                new_ov |= overlap[occ]
            overlap = new_ov
            doc_idx, pos = doc_idx[occ], pos[occ]
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


def phonetic_emissions(term: str, encode, inject: bool) -> list[tuple[str, bool]]:
    """PhoneticFilter emission for one token
    (``phonetic/PhoneticFilter.java:54-95``): the encoded form replaces
    the token, or — with ``inject`` — is emitted at the token's position
    with the ORIGINAL stacked behind it at posIncr 0 (the original is
    the overlap).  An empty or identical code passes the original
    through untouched."""
    try:
        code = encode(term)
    except Exception:
        code = ""
    if not code or code == term:
        return [(term, False)]
    if inject:
        return [(code, False), (term, True)]
    return [(code, False)]


def double_metaphone_emissions(
    term: str, max_code_len: int, inject: bool
) -> list[tuple[str, bool]]:
    """DoubleMetaphoneFilter emission
    (``phonetic/DoubleMetaphoneFilter.java:48-106``): primary and — when
    it differs — alternate codes; with ``inject`` the original leads and
    both codes stack at posIncr 0, without it the primary takes the
    token's position and only the alternate stacks."""
    from lucene_solr_spark.oracle.phonetic import double_metaphone

    p, a = double_metaphone(term, max_code_len)
    ems: list[tuple[str, bool]] = []
    if inject:
        ems.append((term, False))
    emitted = False
    if p and p != term:
        ems.append((p, inject))
        emitted = True
    if a and a != p and p != term:
        ems.append((a, inject or emitted))
        emitted = True
    if not emitted:
        return [(term, False)]
    return ems


def daitch_mokotoff_emissions(term: str, inject: bool) -> list[tuple[str, bool]]:
    """DaitchMokotoffSoundexFilter emission
    (``phonetic/DaitchMokotoffSoundexFilter.java:62-92``): every branch
    code of the word; with ``inject`` the original leads and all codes
    stack at posIncr 0, without it the first code takes the token's
    position and the rest stack (an unencodable word passes through)."""
    from lucene_solr_spark.oracle.phonetic import daitch_mokotoff

    codes = daitch_mokotoff(term)
    if inject:
        return [(term, False)] + [(c, True) for c in codes]
    if not codes:
        return [(term, False)]
    return [(codes[0], False)] + [(c, True) for c in codes[1:]]
