"""ICUFoldingFilter / ICUNormalizer2Filter subset
(``lucene/analysis/icu/src/java/.../ICUFoldingFilter.java``,
``ICUNormalizer2Filter.java``) without the ICU library: the reference
folds through ICU's ``nfkc_cf`` normalizer plus the UTR#30 folding data
(``utr30.nrm``).  This re-expression composes the stdlib pieces of that
pipeline:

    NFKC → Unicode case fold → NFKD → strip combining marks and
    default ignorables → NFKC → native-digit fold → Latin residual
    folds (đ→d, ø→o, stroked/hooked letters UTR#30 maps that survive
    normalization)

which reproduces every golden of the reference's TestICUFoldingFilter
(case folds incl. ß and supplementary plane, Greek accent removal,
Arabic presentation forms, ZWJ removal, composed + decomposed Latin
accents, Bengali digits, đ/æ folds, Turkish dotted-I).  Full utr30
parity (the long tail of symbol/script-specific folds in the binary
data file) is NOT claimed — divergences beyond these stages are
documented rather than hidden.
"""

from __future__ import annotations

import unicodedata

__all__ = ["icu_fold", "icu_normalize"]

#: default ignorables the goldens exercise (ZWJ/ZWNJ/SHY/BOM) plus the
#: general Cf category handled below
_IGNORABLE_CATS = {"Cf", "Mn", "Me"}

#: Latin letters with diacritic STROKES that survive NFKD (UTR#30
#: diacritic folding's residual table, the ASCIIFolding overlap)
_LATIN_RESIDUAL = {
    "đ": "d", "ð": "d", "ħ": "h", "ı": "i", "ł": "l", "ø": "o",
    "ŧ": "t", "ƀ": "b", "ȼ": "c", "ɖ": "d", "ɇ": "e", "ǥ": "g",
    "ⱨ": "h", "ɨ": "i", "ɉ": "j", "ꝁ": "k", "ƚ": "l", "ɍ": "r",
    "ŉ": "'n", "ß": "ss",
    # ligatures NFKD leaves intact (utr30 expands them)
    "æ": "ae", "œ": "oe", "ĳ": "ij", "ǳ": "dz", "ǆ": "dž",
    "þ": "th", "ȸ": "db", "ȹ": "qp",
}


def icu_normalize(term: str) -> str:
    """ICUNormalizer2Filter default mode: nfkc_cf — NFKC plus Unicode
    case folding (ICUNormalizer2Filter.java:43-49)."""
    return unicodedata.normalize("NFKC", term).casefold()


def icu_fold(term: str) -> str:
    """ICUFoldingFilter: normalize, case fold, strip accents/ignorables,
    fold native digits and residual Latin strokes."""
    s = icu_normalize(term)
    s = unicodedata.normalize("NFKD", s)
    out = []
    for ch in s:
        if unicodedata.category(ch) in _IGNORABLE_CATS:
            continue
        out.append(_LATIN_RESIDUAL.get(ch, ch))
    s = unicodedata.normalize("NFKC", "".join(out))
    folded = []
    for ch in s:
        if ch.isdigit() and not ch.isascii():
            d = unicodedata.digit(ch, None)
            folded.append(str(d) if d is not None else ch)
        else:
            folded.append(ch)
    return "".join(folded)
