"""CJKAnalyzer chain kernels (``analysis/cjk/``).

Re-expresses the three CJK-specific stages of the reference chain
(``cjk/CJKAnalyzer.java:95-103``: StandardTokenizer → CJKWidthFilter →
LowerCaseFilter → CJKBigramFilter → StopFilter):

- :func:`width_fold` — ``cjk/CJKWidthFilter.java``: fullwidth ASCII
  variants → basic latin, halfwidth katakana → kana with voiced-mark
  composition (``ｶ`` + ``ﾞ`` → ``ガ``). Applied to the DOCUMENT text
  BEFORE tokenization here (the reference runs it as a token filter;
  char classes must be folded before our tokenizer classifies them —
  halfwidth kana would otherwise tokenize as plain letters). Offsets
  therefore index the FOLDED text; term/position output is identical.
- :func:`cjk_bigram_stream` — ``cjk/CJKBigramFilter.java:150-231``: CJK
  tokens (Han / Hiragana / Katakana / Hangul, per script flags) buffer
  their codepoints as long as tokens stay character-contiguous
  (``startOffset == lastEndOffset``); each buffered pair emits a bigram
  (``<DOUBLE>``), a lone CJK codepoint emits a unigram (``<SINGLE>``),
  non-CJK tokens pass through and flush the buffer. With
  ``output_unigrams=True`` every codepoint also emits its unigram and
  bigrams stack at the unigram's position (posInc 0 — the
  unigram+bigram "synonym" shape, ``CJKBigramFilter.java:157-170,300``).
  Positions RENUMBER sequentially over the emitted stream (every
  emitted token carries the default posInc=1), exactly like the
  reference's clearAttributes-per-emit.

Known tokenizer-inherited divergences (documented in
``oracle/tokenizer.py``): mixed Hangul+latin and Katakana+latin runs
stay/split differently than the jflex grammar's script-typed tokens;
the gate corpora avoid mixed-script juxtaposition.
"""

from __future__ import annotations

__all__ = [
    "width_fold",
    "cjk_char_class",
    "cjk_bigram_stream",
    "HAN",
    "HIRAGANA",
    "KATAKANA",
    "HANGUL",
    "ALL_CJK",
    "CJK_STOP_WORDS",
]

#: script flags (CJKBigramFilter.java:54-61)
HAN = 1
HIRAGANA = 2
KATAKANA = 4
HANGUL = 8
ALL_CJK = HAN | HIRAGANA | KATAKANA | HANGUL

#: ``cjk/stopwords.txt`` — the CJKAnalyzer default stop set
CJK_STOP_WORDS = frozenset(
    (
        "a and are as at be but by for if in into is it no not of on or "
        "s such t that the their then there these they this to was will "
        "with www"
    ).split()
)

#: halfwidth kana 0xFF65-0xFF9D → fullwidth (CJKWidthFilter.KANA_NORM);
#: 0xFF9E/0xFF9F fall back to the combining marks 0x3099/0x309A when
#: they cannot compose with the preceding kana
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]

#: voiced / half-voiced composition deltas for kana 0x30A6-0x30FD
#: (CJKWidthFilter.KANA_COMBINE_VOICED / _HALF_VOICED)
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0,
    0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0,
    0, 2, 0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


def width_fold(text: str) -> str:
    """CJKWidthFilter over a raw string (see module docstring for the
    pre-tokenize placement rationale)."""
    out: list[int] = []
    for ch in text:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(cp - 0xFEE0)
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = out[-1]
                if 0x30A6 <= prev <= 0x30FD:
                    delta = (
                        _KANA_COMBINE_HALF_VOICED[prev - 0x30A6]
                        if cp == 0xFF9F
                        else _KANA_COMBINE_VOICED[prev - 0x30A6]
                    )
                    if delta:
                        out[-1] = prev + delta
                        continue
            out.append(_KANA_NORM[cp - 0xFF65])
        else:
            out.append(cp)
    return "".join(map(chr, out))


def cjk_char_class(ch: str) -> int:
    """Script flag of one codepoint, 0 if not CJK. Ranges match the
    tokenizer's own CJK classes (``oracle/tokenizer.py`` ``_IDEO`` /
    ``_KATA``) so a token the tokenizer emitted as a CJK single/run is
    exactly a token this classifies as CJK."""
    cp = ord(ch)
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF or 0xF900 <= cp <= 0xFAFF:
        return HAN
    if 0x3040 <= cp <= 0x309F:
        return HIRAGANA
    if 0x30A0 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF:
        return KATAKANA
    if 0xAC00 <= cp <= 0xD7AF:
        return HANGUL
    return 0


def _token_flag(term: str, flags: int) -> int:
    """Non-zero iff the WHOLE token is one enabled CJK script — the
    StandardTokenizer type check (``CJKBigramFilter.java:181``): mixed-
    script tokens are typed ALPHANUM by the reference tokenizer and
    pass through unbigrammed."""
    first = cjk_char_class(term[0]) if term else 0
    if not first or not (first & flags):
        return 0
    for ch in term[1:]:
        if cjk_char_class(ch) != first:
            return 0
    return first


def cjk_bigram_stream(
    tokens: list[tuple[str, int, int]],
    *,
    flags: int = ALL_CJK,
    output_unigrams: bool = False,
) -> list[tuple[str, int, int, int]]:
    """(term, start, end) raw-token stream → emitted
    (term, pos, start, end) stream with CJK bigrams formed.

    Buffer-and-flush re-expression of ``CJKBigramFilter.java:150-231``:
    eligible tokens append their codepoints while character-contiguous
    (start == last end); every adjacent buffered pair emits a bigram;
    a buffered codepoint with no pair emits a unigram. Positions are
    the emitted-stream sequence (posInc 1 per token; with
    ``output_unigrams`` bigrams stack at posInc 0 like the reference).
    """
    out: list[tuple[str, int, int]] = []  # (term, start, end) pre-position
    stacked: list[bool] = []  # True = posInc 0 (bigram in unibi mode)
    buf: list[tuple[str, int, int]] = []  # buffered codepoints

    def flush_buffer():
        n = len(buf)
        if n == 0:
            return
        if n == 1 and not output_unigrams:
            t, s, e = buf[0]
            out.append((t, s, e))
            stacked.append(False)
        elif output_unigrams:
            # A + (AB) + B + (BC) + C — bigram stacks on its first char
            for i in range(n):
                t, s, e = buf[i]
                out.append((t, s, e))
                stacked.append(False)
                if i + 1 < n:
                    t2, s2, e2 = buf[i + 1]
                    out.append((t + t2, s, e2))
                    stacked.append(True)
        else:
            for i in range(n - 1):
                t, s, e = buf[i]
                t2, s2, e2 = buf[i + 1]
                out.append((t + t2, s, e2))
                stacked.append(False)
        buf.clear()

    last_end = None
    for term, s, e in tokens:
        f = _token_flag(term, flags)
        if f:
            if buf and s != last_end:
                flush_buffer()
            # append each codepoint with its own 1-char span
            cs = s
            for ch in term:
                buf.append((ch, cs, cs + 1))
                cs += 1
            last_end = e
        else:
            flush_buffer()
            out.append((term, s, e))
            stacked.append(False)
            last_end = None
    flush_buffer()

    result: list[tuple[str, int, int, int]] = []
    pos = -1
    for (term, s, e), stk in zip(out, stacked):
        if not stk:
            pos += 1
        result.append((term, pos, s, e))
    return result
