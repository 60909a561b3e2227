"""WordDelimiterGraphFilter — subword splitting/catenation
(``analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/
WordDelimiterGraphFilter.java`` + ``WordDelimiterIterator.java``).

Model notes (flat-position re-expression):

- the graph filter injects POSITIONS: "PowerShot" occupies two stream
  slots (Power@p, Shot@p+1) and every later token shifts — unlike the
  stacking filters (synonyms/ngram), so the batch kernel renumbers
  positions over the emitted stream (the indexer ignores posLength, so
  flat positions lose nothing the index would keep);
- emission order per token is the reference's buffer sort (startPart
  asc, endPart desc, PRESERVE_ORIGINAL first —
  ``WordDelimiterGraphFilter.java:442-458,334-336``) and an emission is
  an overlap (posIncr 0, discounted from norms) iff its startPos equals
  the running wordPos (``:420``);
- per-token results are computed once per UNIQUE term (dictionary
  encode) and scattered to occurrences — the expansion is a pure
  function of the term text, so the scalar port runs |vocabulary|
  times per batch, not |tokens| times;
- the char-type table is the DEFAULT_WORD_DELIM_TABLE semantics
  (``WordDelimiterIterator.java:85-103,313-358``) over code points
  (Java's surrogate-pair ALPHA|DIGIT pinning is moot — Python strings
  are code points, typed by their real category);
- IGNORE_KEYWORDS is unsupported (no keyword attribute in this chain).

Flags mirror the reference constants (``WordDelimiterGraphFilter.java:
94-147``).
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "GENERATE_WORD_PARTS",
    "GENERATE_NUMBER_PARTS",
    "CATENATE_WORDS",
    "CATENATE_NUMBERS",
    "CATENATE_ALL",
    "PRESERVE_ORIGINAL",
    "SPLIT_ON_CASE_CHANGE",
    "SPLIT_ON_NUMERICS",
    "STEM_ENGLISH_POSSESSIVE",
    "WDGF_DEFAULT",
    "wdgf_parts",
    "apply_word_delimiter",
]

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

#: the Solr factory's default configuration (generate both part kinds,
#: split on case + numerics, strip possessives)
WDGF_DEFAULT = (
    GENERATE_WORD_PARTS
    | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE
    | SPLIT_ON_NUMERICS
    | STEM_ENGLISH_POSSESSIVE
)

# char classes (WordDelimiterIterator.java:28-31)
_LOWER, _UPPER, _DIGIT, _DELIM = 0x01, 0x02, 0x04, 0x08
_ALPHA = _LOWER | _UPPER


def _char_type(ch: str) -> int:
    """DEFAULT_WORD_DELIM_TABLE / getType semantics
    (WordDelimiterIterator.java:85-103 for latin-1, :313-358 beyond)."""
    cat = unicodedata.category(ch)
    if cat == "Ll":
        return _LOWER
    if cat == "Lu":
        return _UPPER
    if cat in ("Nd", "Nl", "No"):
        return _DIGIT
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return _ALPHA
    if cat == "Cs":
        return _ALPHA | _DIGIT  # surrogate: prevent splitting
    return _DELIM


class _Iter:
    """WordDelimiterIterator (WordDelimiterIterator.java:140-300):
    yields (current, end) subword bounds over the trimmed text."""

    DONE = -1

    def __init__(self, text, split_case, split_num, stem_poss):
        self.text = text
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss
        self.types = [_char_type(c) for c in text]
        n = len(text)
        sb = 0
        while sb < n and self.types[sb] & _DELIM:
            sb += 1
        eb = n
        while eb > sb and self.types[eb - 1] & _DELIM:
            eb -= 1
        self.start_bounds, self.end_bounds = sb, eb
        self.has_final_possessive = self._ends_with_possessive(eb)
        self.current = sb
        self.end = 0
        self.skip_possessive = False

    def _ends_with_possessive(self, pos: int) -> bool:
        t = self.text
        return (
            self.stem_poss
            and pos > 2
            and t[pos - 2] == "'"
            and t[pos - 1] in "sS"
            and (self.types[pos - 3] & _ALPHA)
            and (pos == self.end_bounds or (self.types[pos] & _DELIM))
        )

    def _is_break(self, last_type: int, typ: int) -> bool:
        # WordDelimiterIterator.java:225-243
        if typ & last_type:
            return False
        if not self.split_case and (last_type & _ALPHA) and (typ & _ALPHA):
            return False
        if (last_type & _UPPER) and (typ & _ALPHA):
            return False
        if not self.split_num and (
            ((last_type & _ALPHA) and (typ & _DIGIT))
            or ((last_type & _DIGIT) and (typ & _ALPHA))
        ):
            return False
        return True

    def next(self) -> int:
        self.current = self.end
        if self.current == self.DONE:
            return self.DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        while self.current < self.end_bounds:
            last_type = self.types[self.current]
            if not (last_type & _DELIM):
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = self.DONE
            return self.DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            typ = self.types[self.end]
            if self._is_break(last_type, typ):
                break
            last_type = typ
            self.end += 1
        if self.end < self.end_bounds - 1 and self._ends_with_possessive(
            self.end + 2
        ):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == self.DONE:
            return 0
        t = self.types[self.current]
        return _ALPHA if t & _ALPHA and not t & _DIGIT else t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return (
                self.current == self.start_bounds
                and self.end == self.end_bounds - 2
            )
        return self.current == self.start_bounds and self.end == self.end_bounds


def wdgf_parts(
    term: str, flags: int = WDGF_DEFAULT, prot_words: frozenset[str] | None = None
):
    """One source token → ``(emissions, shift)`` where ``emissions`` is
    ``[(text, relpos, overlap), ...]`` in stream order (relpos = graph
    start position relative to the token's slot; overlap = posIncr 0)
    and ``shift`` = extra positions the token injects (its last relpos).
    Returns ``None`` when the token is swallowed (all delimiters, no
    PRESERVE_ORIGINAL — the hole survives downstream)."""

    def has(f):
        return flags & f

    n = len(term)
    it = _Iter(
        term,
        bool(has(SPLIT_ON_CASE_CHANGE)),
        bool(has(SPLIT_ON_NUMERICS)),
        bool(has(STEM_ENGLISH_POSSESSIVE)),
    )
    it.next()
    # word of no delimiters, or protected: pass through unchanged
    # (WordDelimiterGraphFilter.java:365-371)
    if (it.current == 0 and it.end == n) or (
        prot_words is not None and term in prot_words
    ):
        return [(term, 0, False)], 0
    # word of only delimiters (:373-381)
    if it.end == _Iter.DONE:
        if not has(PRESERVE_ORIGINAL):
            return None
        return [(term, 0, False)], 0

    # bufferWordParts (:253-341): (text, start_pos, end_pos, start_part,
    # end_part) tuples; PRESERVE_ORIGINAL first with endPos patched later
    buffered: list[list] = []
    word_pos = 0
    last_concat_count = 0
    if has(PRESERVE_ORIGINAL):
        buffered.append([term, 0, 1, 0, n])

    if it.is_single_word():
        buffered.append([term[it.current : it.end], word_pos, word_pos + 1,
                         it.current, it.end])
        word_pos += 1
        it.next()
    else:
        # concatenation state: [chars, start_part, end_part, start_pos,
        # type, subword_count]
        concat = ["", 0, 0, 0, 0, 0]
        concat_all = ["", 0, 0, 0, 0, 0]

        def concatenate(c):
            if not c[0]:
                c[4] = it.type()
                c[1] = it.current
                c[3] = word_pos
            c[0] += term[it.current : it.end]
            c[5] += 1
            c[2] = it.end

        def should_generate(word_type):
            return (has(GENERATE_WORD_PARTS) and word_type & _ALPHA) or (
                has(GENERATE_NUMBER_PARTS) and word_type & _DIGIT
            )

        def write_concat(c):
            buffered.append([c[0], c[3], word_pos, c[1], c[2]])

        def flush_concat(c):
            nonlocal word_pos, last_concat_count
            if word_pos == c[3]:
                word_pos += 1  # not generating parts: advance now
            last_concat_count = c[5]
            if c[5] != 1 or not should_generate(c[4]):
                write_concat(c)
            c[:] = ["", 0, 0, 0, 0, 0]

        while it.end != _Iter.DONE:
            word_type = it.type()
            if concat[0] and not (concat[4] & word_type):
                flush_concat(concat)
            if (has(CATENATE_WORDS) and word_type & _ALPHA) or (
                has(CATENATE_NUMBERS) and word_type & _DIGIT
            ):
                concatenate(concat)
            if has(CATENATE_ALL):
                concatenate(concat_all)
            if should_generate(word_type):
                buffered.append([term[it.current : it.end], word_pos,
                                 word_pos + 1, it.current, it.end])
                word_pos += 1
            it.next()

        if concat[0]:
            flush_concat(concat)
        if concat_all[0]:
            # only if not already written above (:314-323)
            if concat_all[5] > last_concat_count:
                if word_pos == concat_all[3]:
                    word_pos += 1
                write_concat(concat_all)

    if has(PRESERVE_ORIGINAL):
        if word_pos == 0:
            word_pos += 1
        buffered[0][2] = word_pos

    if not buffered:
        # nothing generated (e.g. number-only term without
        # GENERATE_NUMBER_PARTS, testOnlyNumbers): swallowed, hole stays
        return None

    # PositionSorter (:442-458): startPart asc, endPart desc; the
    # original (if preserved) stays pinned first
    head = 1 if has(PRESERVE_ORIGINAL) else 0
    buffered[head:] = sorted(buffered[head:], key=lambda b: (b[3], -b[4]))

    # emission walk (:400-424): posIncr = startPos - wordPos
    out = []
    word_pos = 0
    for text, start_pos, _end_pos, _sp, _ep in buffered:
        inc = start_pos - word_pos
        assert inc >= 0, (term, flags, buffered)
        out.append((text, start_pos, inc == 0 and out != []))
        word_pos = start_pos
    return out, word_pos


def batch_whitespace_tokenize(texts, max_token_length: int = 255):
    """WhitespaceTokenizer (``analysis/core/WhitespaceTokenizer.java`` —
    a CharTokenizer splitting on whitespace, chunking tokens at
    ``maxTokenLen`` chars rather than dropping them): batch → flat
    (doc_idx, terms, pos) with sequential positions. Python's
    ``str.split`` whitespace class ≈ ``Character.isWhitespace`` (they
    disagree on U+00A0-style non-breaking spaces — noted divergence).
    The delimiter-preserving tokenizer WordDelimiterGraphFilter wants
    (``WordDelimiterGraphFilter.java:83-86`` recommends a tokenizer
    that keeps intra-word punctuation)."""
    all_terms: list[str] = []
    counts = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = ("" if t is None else t).split()
        if any(len(tok) > max_token_length for tok in toks):
            chunked = []
            for tok in toks:
                while len(tok) > max_token_length:
                    chunked.append(tok[:max_token_length])
                    tok = tok[max_token_length:]
                if tok:
                    chunked.append(tok)
            toks = chunked
        counts[i] = len(toks)
        all_terms.extend(toks)
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    ends = np.cumsum(counts)
    pos = np.arange(len(all_terms), dtype=np.int64) - np.repeat(
        ends - counts, counts
    )
    return doc_idx, pa.array(all_terms, pa.string()), pos


def apply_word_delimiter(
    doc_idx: np.ndarray,
    terms,
    pos: np.ndarray,
    *,
    flags: int = WDGF_DEFAULT,
    prot_words: frozenset[str] | None = None,
):
    """(doc_idx, terms, pos) token stream → the delimited stream with
    positions RENUMBERED over emitted slots (the graph injects
    positions; original holes are preserved as gaps). Returns
    ``(doc_idx', terms', pos', overlap')``."""
    doc_idx = np.asarray(doc_idx, np.int64)
    pos = np.asarray(pos, np.int64)
    if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
        terms = pa.array(list(terms), pa.string())
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n == 0:
        return doc_idx, terms, pos, np.empty(0, np.uint8)

    # per-UNIQUE-term expansion (the function is pure in the term text)
    denc = pc.dictionary_encode(terms)
    codes = np.asarray(denc.indices, np.int64)
    vocab = denc.dictionary.to_pylist()
    per = [wdgf_parts(t, flags, prot_words) for t in vocab]
    k = np.array([0 if p is None else len(p[0]) for p in per], np.int64)
    shift = np.array([0 if p is None else p[1] for p in per], np.int64)

    occ_k = k[codes]
    # injected-position shift: each emitted token pushes LATER tokens of
    # its doc by its shift — exclusive per-doc cumsum of occurrence
    # shifts on top of the original (hole-preserving) positions
    occ_shift = shift[codes]
    csum = np.cumsum(occ_shift) - occ_shift  # exclusive prefix
    if len(doc_idx):
        doc_start = np.r_[True, doc_idx[1:] != doc_idx[:-1]]
        base_idx = np.nonzero(doc_start)[0]
        doc_base = np.repeat(csum[base_idx], np.diff(np.r_[base_idx, n]))
        csum = csum - doc_base
    new_base = pos + csum

    # scatter: occurrence i yields k[code_i] rows
    occ = np.repeat(np.arange(n), occ_k)
    # per-vocab flattening once, then gather per occurrence
    vtexts, vrel, vov, voff = [], [], [], [0]
    for p in per:
        if p is not None:
            for t, r, ov in p[0]:
                vtexts.append(t)
                vrel.append(r)
                vov.append(1 if ov else 0)
        voff.append(len(vtexts))
    vrel = np.array(vrel, np.int64)
    vov = np.array(vov, np.uint8)
    voff = np.array(voff, np.int64)
    # flat indices into the vocab emission table
    within = np.arange(len(occ)) - np.repeat(
        np.cumsum(occ_k) - occ_k, occ_k
    )
    vidx = voff[codes[occ]] + within
    flat_rel = vrel[vidx]
    flat_ov = vov[vidx]
    vtext_arr = pa.array(vtexts, pa.string())
    out_terms = vtext_arr.take(pa.array(vidx, pa.int64()))
    return (
        doc_idx[occ],
        out_terms,
        new_base[occ] + flat_rel,
        flat_ov,
    )
