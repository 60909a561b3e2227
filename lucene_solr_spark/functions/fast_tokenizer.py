"""Vectorized batch tokenizer — the index-build hot path.

Semantics: EXACTLY ``oracle.tokenizer.analyze`` (StandardAnalyzer chain;
``analysis/standard/StandardTokenizerImpl.jflex:95-112,225-265`` rules as
re-expressed there), computed over a WHOLE Arrow batch at once:

- the batch is concatenated and viewed as a uint32 codepoint array;
  character classes come from lookup tables built FROM THE ORACLE'S OWN
  PREDICATES/CLASSES per codepoint (parity by construction) for every
  codepoint below ``FAST_LIMIT`` (0x1FC00 — past the emoji block);
- word runs: a \\w char continues a run; a mid-char (``. : ' ’ , ;``)
  joins iff its neighbors are letters (MidLetter/MidNumLet) or digits
  (MidNum/MidNumLet) — evaluated as shifted boolean masks; CJK
  ideographs and non-word emoji are single-char tokens merged into the
  run stream by start offset; token runs are diff-detected; token text
  is ONE numpy gather + utf-32→utf-8 re-encode into an Arrow
  ``StringArray`` (zero per-token Python objects);
- documents containing a codepoint ≥ FAST_LIMIT or one whose
  ``str.lower()`` is not a single codepoint (e.g. U+0130) take the
  per-document oracle kernel, so the fast path never changes semantics.

For in-range input the run rule is equivalent to the oracle's
regex+split: a mid-char with an invalid neighbor splits the run exactly
where ``_split_candidate`` splits the regex candidate; consecutive
mid-chars never join (the neighbor is then a mid-char — neither letter
nor digit); and ``_split_candidate``'s ideograph explosion is exactly
"ideographs break runs and stand alone".
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from lucene_solr_spark.oracle import tokenizer as _otok
from lucene_solr_spark.oracle.tokenizer import MAX_TOKEN_LENGTH_DEFAULT, analyze

__all__ = ["batch_tokenize", "FAST_LIMIT"]

FAST_LIMIT = 0x1FC00  # one past the oracle's emoji block (\U0001FBFF)


def _build_luts():
    n = FAST_LIMIT
    all_chars = "".join(map(chr, range(n)))
    word = np.zeros(n, np.bool_)
    for m in re.finditer(r"\w", all_chars, re.UNICODE):
        word[m.start()] = True
    ideo = np.zeros(n, np.bool_)
    for m in re.finditer(rf"[{_otok._IDEO}]", all_chars):
        ideo[m.start()] = True
    emoji = np.zeros(n, np.bool_)
    for m in re.finditer(rf"[{_otok._EMOJI}]", all_chars):
        emoji[m.start()] = True
    digit = np.fromiter(map(str.isdigit, all_chars), np.bool_, n)
    # oracle _is_letter: isalpha ∧ ¬ideo ∧ ∉ mid set
    alpha = np.fromiter(map(str.isalpha, all_chars), np.bool_, n)
    mid_l = np.zeros(n, np.bool_)
    mid_n = np.zeros(n, np.bool_)
    for ch in _otok._MID_LETTER:
        mid_l[ord(ch)] = True
    for ch in _otok._MID_NUM:
        mid_n[ord(ch)] = True
    mid_any = np.zeros(n, np.bool_)
    for ch in _otok._MID_ALL:
        mid_any[ord(ch)] = True
    letter = alpha & ~ideo & ~mid_any
    lower = np.arange(n, dtype=np.uint32)
    bad_lower = np.zeros(n, np.bool_)
    lowered = [ch.lower() for ch in all_chars]
    for cp, lo in enumerate(lowered):
        if len(lo) == 1:
            o = ord(lo)
            if o < n:
                lower[cp] = o
            else:
                bad_lower[cp] = True
        else:
            bad_lower[cp] = True
    utf8len = np.ones(n, np.int64)
    utf8len[0x80:] = 2
    utf8len[0x800:] = 3
    utf8len[0x10000:] = 4
    run_char = word & ~ideo
    single_char = ideo | (emoji & ~word)
    return run_char, single_char, letter, digit, mid_l, mid_n, lower, bad_lower, utf8len


_LUT_NAMES = (
    "run",
    "single",
    "letter",
    "digit",
    "mid_l",
    "mid_n",
    "lower",
    "bad_lower",
    "utf8len",
)


def _load_or_build_luts():
    """Per-machine LUT cache: ~0.45s of unicodedata scans per Python
    worker otherwise — workers are many and short-lived under Spark, so
    the first worker builds, the rest mmap-load in ~5 ms."""
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(), f"lss_tokenizer_luts_v1_{FAST_LIMIT:x}.npz"
    )
    if os.path.exists(path):
        try:
            z = np.load(path)
            return tuple(z[n] for n in _LUT_NAMES)
        except Exception:  # corrupt/partial: rebuild
            pass
    luts = _build_luts()
    try:
        fd, tmp = tempfile.mkstemp(dir=tempfile.gettempdir(), suffix=".npz")
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **dict(zip(_LUT_NAMES, luts)))
        os.replace(tmp, path)  # atomic: concurrent workers race safely
    except Exception:
        pass
    return luts


(
    _RUN,
    _SINGLE,
    _LETTER,
    _DIGIT,
    _MID_L,
    _MID_N,
    _LOWER,
    _BAD_LOWER,
    _UTF8LEN,
) = _load_or_build_luts()


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


def batch_tokenize(
    texts,
    *,
    lowercase: bool | str = True,
    stopwords: frozenset[str] = frozenset(),
    max_token_length: int = MAX_TOKEN_LENGTH_DEFAULT,
    strip_possessive: bool = False,
    fold_ascii: bool = False,
    stemmer: str | None = None,
    elide: frozenset[str] | None = None,
    stem_exclusions: frozenset[str] | None = None,
    pre_stop: frozenset[str] | None = None,
    apostrophe: bool = False,
    with_offsets: bool = False,
):
    """Tokenize a batch of documents.

    ``texts``: sequence of str|None (one per document).
    Returns ``(doc_idx, terms, pos)``: int64 row index into ``texts`` per
    token, an Arrow string array of (lowercased, possessive-stripped,
    optionally elided, stop-filtered, optionally stemmed) terms, and
    int32 positions with stop/overlong gaps preserved.

    ``elide``: article set for ElisionFilter (util/ElisionFilter.java —
    drop ``l'``/``qu'``-style prefixes); runs BEFORE the stop filter
    like the FrenchAnalyzer chain, as one vectorized anchored-regex
    replace. ``stemmer``: any ``oracle.light_stemmers.resolve`` name
    ("porter", "german_light", "french_light", …).

    ``with_offsets=True`` returns ``(doc_idx, terms, pos, soff, eoff)``
    with each surviving token's character span in its source document —
    the IndexOptions...AND_OFFSETS posting stream
    (``index/IndexOptions.java:50``). Spans are Unicode-codepoint offsets
    (Python string indexing); Java's UTF-16 units agree on BMP text.
    Filters never shift offsets: a possessive-stripped or stemmed term
    keeps the ORIGINAL token's span, exactly like Lucene's token filters.

    The possessive strip is one vectorized regex replace; stemming runs
    once per DISTINCT term via dictionary-encode (the per-batch
    vocabulary is tiny next to the token stream), so neither filter adds
    per-token Python to the hot path.
    """
    from lucene_solr_spark.oracle.light_stemmers import (
        resolve_with_exclusions as _resolve,
    )

    # validate the name before any work; SetKeywordMarkerFilter semantics
    # (stem_exclusions) live inside the resolved callable
    stem_fn = _resolve(stemmer, stem_exclusions)
    n_docs = len(texts)
    norm_texts = ["" if t is None else t for t in texts]

    out_doc: list[np.ndarray] = []
    out_terms: list[pa.Array] = []
    out_pos: list[np.ndarray] = []
    out_soff: list[np.ndarray] = []
    out_eoff: list[np.ndarray] = []

    joined = "\n".join(norm_texts)
    # surrogatepass: Python strings can carry lone surrogates (Arrow
    # strings cannot, but the API accepts any str); they classify as
    # non-word via the LUTs, so they break tokens exactly like the
    # oracle's regex and never appear inside a token's text
    cp = np.frombuffer(
        joined.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    )
    lens = np.fromiter((len(t) for t in norm_texts), np.int64, n_docs)
    doc_off = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lens + 1, out=doc_off[1:])  # +1 per '\n' separator

    # per-doc fast/slow routing, vectorized
    if len(cp):
        in_range = cp < FAST_LIMIT
        cpi = np.minimum(cp, FAST_LIMIT - 1)
        bad = ~in_range
        if lowercase is True:
            # char-level lowering only; lowercase="irish" lowers per
            # DISTINCT term in Python (always oracle-identical), so it
            # needs no slow-doc routing
            bad = bad | _BAD_LOWER[cpi]
        seg_starts = doc_off[:-1].clip(max=len(cp) - 1)
        doc_bad = np.maximum.reduceat(bad.view(np.uint8), seg_starts).astype(bool)
        slow_docs = np.nonzero(doc_bad)[0]
        slow_set = doc_bad
    else:
        cpi = cp
        slow_docs = np.empty(0, np.int64)
        slow_set = np.zeros(n_docs, bool)

    if len(cp):
        is_run = _RUN[cpi] & in_range
        is_letter = _LETTER[cpi]
        is_digit = _DIGIT[cpi]
        join_l = _MID_L[cpi] & _shift_prev(is_letter) & _shift_next(is_letter)
        join_n = _MID_N[cpi] & _shift_prev(is_digit) & _shift_next(is_digit)
        tok = is_run | join_l | join_n

        d = np.diff(np.r_[np.int8(0), tok.view(np.int8), np.int8(0)])
        starts = np.nonzero(d == 1)[0]
        tlen = np.nonzero(d == -1)[0] - starts
        singles = np.nonzero(_SINGLE[cpi] & in_range)[0]
        if singles.size:
            starts = np.concatenate([starts, singles])
            tlen = np.concatenate([tlen, np.ones(singles.size, np.int64)])
            order = np.argsort(starts, kind="stable")
            starts, tlen = starts[order], tlen[order]
    else:
        starts = np.empty(0, np.int64)
        tlen = np.empty(0, np.int64)

    if starts.size:
        # doc of each token; separators are non-word so runs never span docs
        tdoc = np.searchsorted(doc_off, starts, side="right") - 1
        # 0-based position within doc over ALL raw tokens
        first = np.r_[True, tdoc[1:] != tdoc[:-1]]
        tok_seq = np.arange(starts.size, dtype=np.int32)
        pos = (tok_seq - tok_seq[first][np.cumsum(first) - 1]).astype(np.int32)

        keep = (tlen <= max_token_length) & ~slow_set[tdoc]
        starts, tlen, tdoc, pos = starts[keep], tlen[keep], tdoc[keep], pos[keep]
        soff = eoff = None
        if with_offsets:
            # char spans relative to each token's own document
            soff = (starts - doc_off[tdoc]).astype(np.int32)
            eoff = (soff + tlen).astype(np.int32)

        if starts.size:
            data = _LOWER[cpi] if lowercase is True else cp
            total = int(tlen.sum())
            # int32 index space: a batch is < 2^31 chars by construction
            # (Arrow batches), and halving the temp footprint halves the
            # page-fault warmup cost on kernels with slow anon faults
            tlen32 = tlen.astype(np.int32)
            cum = np.zeros(len(tlen), np.int32)
            np.cumsum(tlen32[:-1], out=cum[1:])
            gather = (
                np.arange(total, dtype=np.int32)
                - np.repeat(cum, tlen32)
                + np.repeat(starts.astype(np.int32), tlen32)
            )
            gcp = data[gather]
            # utf-32 → utf-8: one C-level decode/encode for the whole batch
            tbytes = (
                gcp.astype(np.uint32)
                .tobytes()
                .decode("utf-32-le", "surrogatepass")
                .encode("utf-8", "surrogatepass")
            )
            blen = _UTF8LEN[np.minimum(gcp, FAST_LIMIT - 1)]
            tok_blen = np.add.reduceat(blen, cum)
            offs64 = np.zeros(len(tlen) + 1, np.int64)
            np.cumsum(tok_blen, out=offs64[1:])
            offsets = offs64.astype(np.int32)  # Arrow batches are < 2 GiB
            terms = pa.Array.from_buffers(
                pa.utf8(),
                len(tlen),
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(tbytes)],
            )
            if pre_stop:
                # IrishAnalyzer's StopFilter(HYPHENATIONS) slot: a
                # case-insensitive stop on RAW tokens BEFORE elision;
                # positions were assigned pre-mask, so gaps survive
                mps = pc.is_in(
                    pc.utf8_lower(terms),
                    value_set=pa.array(sorted(pre_stop), pa.utf8()),
                )
                keepp = np.invert(
                    pc.fill_null(mps, False).to_numpy(zero_copy_only=False)
                )
                terms = terms.filter(pa.array(keepp))
                tdoc = tdoc[keepp]
                pos = pos[keepp]
                if with_offsets:
                    soff = soff[keepp]
                    eoff = eoff[keepp]
            if apostrophe:
                # ApostropheFilter (tr/ApostropheFilter.java): truncate
                # at the first apostrophe; tokens never contain newlines,
                # so '.*' reaches the token end
                terms = pc.replace_substring_regex(
                    terms,
                    pattern="['’].*",
                    replacement="",
                    max_replacements=1,
                )
            if strip_possessive:
                terms = pc.replace_substring_regex(
                    terms, pattern="['’][sS]$", replacement=""
                )
            if elide:
                from lucene_solr_spark.oracle.light_stemmers import (
                    elision_regex,
                )

                terms = pc.replace_substring_regex(
                    terms,
                    pattern=elision_regex(elide),
                    replacement="",
                    max_replacements=1,
                )
            if lowercase in ("irish", "turkish") and len(terms):
                # IrishLowerCaseFilter AFTER elision (the fold reads the
                # original casing) / TurkishLowerCaseFilter after the
                # apostrophe strip; per-DISTINCT-term like the stemmers
                from lucene_solr_spark.oracle.light_stemmers import (
                    irish_lower,
                    turkish_lower,
                )

                fold_fn = irish_lower if lowercase == "irish" else turkish_lower
                dirr = pc.dictionary_encode(terms)
                folded_ga = pa.array(
                    [fold_fn(t) for t in dirr.dictionary.to_pylist()],
                    pa.utf8(),
                )
                terms = folded_ga.take(dirr.indices)
            if fold_ascii and len(terms):
                # per-DISTINCT-term fold via dictionary encode (the
                # stemmer pattern): the batch vocabulary is tiny next to
                # the token stream, ASCII-pure batches skip entirely
                from lucene_solr_spark.oracle.tokenizer import fold_accents

                denc0 = pc.dictionary_encode(terms)
                dvals = denc0.dictionary.to_pylist()
                if any(not t.isascii() for t in dvals):
                    folded = pa.array(
                        [fold_accents(t) for t in dvals], pa.utf8()
                    )
                    terms = folded.take(denc0.indices)
            if stopwords:
                m = pc.is_in(
                    terms, value_set=pa.array(sorted(stopwords), pa.utf8())
                )
                keep2 = np.invert(
                    pc.fill_null(m, False).to_numpy(zero_copy_only=False)
                )
                terms = terms.filter(pa.array(keep2))
                tdoc = tdoc[keep2]
                pos = pos[keep2]
                if with_offsets:
                    soff = soff[keep2]
                    eoff = eoff[keep2]
            if stem_fn is not None and len(terms):
                denc = pc.dictionary_encode(terms)
                stemmed = pa.array(
                    [stem_fn(t) for t in denc.dictionary.to_pylist()],
                    pa.utf8(),
                )
                terms = stemmed.take(denc.indices)
            out_doc.append(tdoc)
            out_terms.append(terms)
            out_pos.append(pos)
            if with_offsets:
                out_soff.append(soff)
                out_eoff.append(eoff)

    for i in slow_docs.tolist():
        if with_offsets:
            from lucene_solr_spark.functions.highlight import analyze_with_offsets

            otoks = analyze_with_offsets(
                norm_texts[i],
                lowercase=lowercase,
                stopwords=stopwords,
                max_token_length=max_token_length,
                strip_possessive=strip_possessive,
                fold_ascii=fold_ascii,
                stemmer=stemmer,
                elide=elide,
                stem_exclusions=stem_exclusions,
                pre_stop=pre_stop,
                apostrophe=apostrophe,
            )
            if not otoks:
                continue
            out_doc.append(np.full(len(otoks), i, np.int64))
            out_terms.append(pa.array([t for t, _p, _s, _e in otoks], pa.utf8()))
            out_pos.append(
                np.fromiter((p for _t, p, _s, _e in otoks), np.int32, len(otoks))
            )
            out_soff.append(
                np.fromiter((s_ for _t, _p, s_, _e in otoks), np.int32, len(otoks))
            )
            out_eoff.append(
                np.fromiter((e for _t, _p, _s, e in otoks), np.int32, len(otoks))
            )
            continue
        toks = analyze(
            norm_texts[i],
            lowercase=lowercase,
            stopwords=stopwords,
            max_token_length=max_token_length,
            strip_possessive=strip_possessive,
            fold_ascii=fold_ascii,
            stemmer=stemmer,
            elide=elide,
            stem_exclusions=stem_exclusions,
            pre_stop=pre_stop,
            apostrophe=apostrophe,
        )
        if not toks:
            continue
        out_doc.append(np.full(len(toks), i, np.int64))
        out_terms.append(pa.array([t.term for t in toks], pa.utf8()))
        out_pos.append(np.fromiter((t.pos for t in toks), np.int32, len(toks)))

    if not out_doc:
        empty = (
            np.empty(0, np.int64),
            pa.array([], pa.utf8()),
            np.empty(0, np.int32),
        )
        return empty + (np.empty(0, np.int32), np.empty(0, np.int32)) if with_offsets else empty
    res = (
        np.concatenate(out_doc),
        pa.concat_arrays(out_terms) if len(out_terms) > 1 else out_terms[0],
        np.concatenate(out_pos),
    )
    if with_offsets:
        return res + (np.concatenate(out_soff), np.concatenate(out_eoff))
    return res
