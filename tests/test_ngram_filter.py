"""NGramTokenFilter / EdgeNGramTokenFilter — the vectorized expansion
(functions/ngram.py) vs a scalar twin of the reference state machine
(``ngram/NGramTokenFilter.java:100-148``, ``EdgeNGramTokenFilter.java:
88-138``), plus the reference's own golden vectors re-expressed in the
absolute-position model (all grams of a token at the token's position;
a token emitting nothing leaves a gap)."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from lucene_solr_spark.functions.ngram import ngram_expand


def scalar_ngram(tokens, min_gram, max_gram, *, edge, preserve):
    """(term, pos) stream → [(term', pos', overlap)] — a direct
    transliteration of the Java incrementToken loops, with absolute
    positions (posIncr bookkeeping collapses to 'all emissions of a
    token share its position; first emission is the non-overlap one')."""
    out = []
    for term, pos in tokens:
        n = len(term)  # Python len = code points, like codePointCount
        first = True

        def emit(t, overlap_forced=None):
            nonlocal first
            ov = (not first) if overlap_forced is None else overlap_forced
            out.append((t, pos, ov))
            first = False

        if preserve and n < min_gram:
            emit(term)
            continue
        if edge:
            for g in range(min_gram, max_gram + 1):
                if g > n:
                    break
                emit(term[:g])
        else:
            for s in range(0, n - min_gram + 1):
                for g in range(min_gram, max_gram + 1):
                    if s + g > n:
                        break
                    emit(term[s : s + g])
        if preserve and n > max_gram:
            emit(term, overlap_forced=True)
    return out


def run_vec(tokens, min_gram, max_gram, *, edge, preserve):
    doc_idx = np.zeros(len(tokens), np.int64)
    terms = pa.array([t for t, _ in tokens], pa.string())
    pos = np.array([p for _, p in tokens], np.int64)
    d, t, p, o = ngram_expand(
        doc_idx,
        terms,
        pos,
        min_gram=min_gram,
        max_gram=max_gram,
        edge=edge,
        preserve_original=preserve,
    )
    assert (d == 0).all()
    return list(zip(t.to_pylist(), p.tolist(), [bool(x) for x in o]))


def canon(stream):
    return sorted(stream)


# --------------------------------------------------- reference goldens


def test_bigrams_golden():
    # TestNGramTokenFilter.testBigrams: "abcde" → ab bc cd de, incr 1 0 0 0
    got = canon(run_vec([("abcde", 0)], 2, 2, edge=False, preserve=False))
    assert got == canon(
        [("ab", 0, False), ("bc", 0, True), ("cd", 0, True), ("de", 0, True)]
    )


def test_ngrams_golden():
    # testNgrams: 1..3 over "abcde" → a ab abc b bc bcd c cd cde d de e
    got = run_vec([("abcde", 0)], 1, 3, edge=False, preserve=False)
    assert sorted(t for t, _, _ in got) == sorted(
        ["a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde", "d", "de", "e"]
    )
    assert sum(1 for _, _, ov in got if not ov) == 1  # one posIncr>0 slot


def test_small_token_in_stream_golden():
    # testSmallTokenInStream: "abc de fgh", 3..3 → abc _gap_ fgh (de gone)
    got = canon(run_vec([("abc", 0), ("de", 1), ("fgh", 2)], 3, 3, edge=False, preserve=False))
    assert got == canon([("abc", 0, False), ("fgh", 2, False)])


def test_small_token_preserve_golden():
    # testSmallTokenInStreamPreserveOriginal: de kept, carries increment
    got = canon(run_vec([("abc", 0), ("de", 1), ("fgh", 2)], 3, 3, edge=False, preserve=True))
    assert got == canon(
        [("abc", 0, False), ("de", 1, False), ("fgh", 2, False)]
    )


def test_keep_short_keep_long_golden():
    # testKeepShortTermKeepLongTerm: "a bcd efghi jk", 2..3
    toks = [("a", 0), ("bcd", 1), ("efghi", 2), ("jk", 3)]
    got = canon(run_vec(toks, 2, 3, edge=False, preserve=False))
    want = [
        ("bc", 1, False), ("bcd", 1, True), ("cd", 1, True),
        ("ef", 2, False), ("efg", 2, True), ("fg", 2, True),
        ("fgh", 2, True), ("gh", 2, True), ("ghi", 2, True),
        ("hi", 2, True), ("jk", 3, False),
    ]
    assert got == canon(want)
    # preserveOriginal: 'a' kept (non-overlap), 'efghi' appended (overlap)
    got_p = canon(run_vec(toks, 2, 3, edge=False, preserve=True))
    assert got_p == canon(
        want + [("a", 0, False), ("efghi", 2, True)]
    )


def test_oversized_preserve_golden():
    # testOversizedNgramsPreserveOriginal: 6..6 over "abcde" → original
    assert run_vec([("abcde", 0)], 6, 6, edge=False, preserve=True) == [
        ("abcde", 0, False)
    ]
    assert run_vec([("abcde", 0)], 6, 7, edge=False, preserve=False) == []


def test_edge_front_golden():
    # TestEdgeNGramTokenFilter.testFrontRangeOfNgrams: "abcde" 1..3
    got = run_vec([("abcde", 0)], 1, 3, edge=True, preserve=False)
    assert [t for t, _, _ in got] == ["a", "ab", "abc"]
    assert [ov for _, _, ov in got] == [False, True, True]


def test_edge_preserve_golden():
    # EdgeNGram preserveOriginal: short kept w/ increment, long appended
    got = canon(run_vec([("a", 0), ("abcde", 1)], 2, 3, edge=True, preserve=True))
    assert got == canon(
        [
            ("a", 0, False),
            ("ab", 1, False),
            ("abc", 1, True),
            ("abcde", 1, True),
        ]
    )


def test_supplementary_codepoints():
    # NGramTokenFilter.java:107 codePointCount: 𝄞 is ONE gram unit
    got = run_vec([("𝄞ab", 0)], 2, 2, edge=False, preserve=False)
    assert [t for t, _, _ in got] == ["𝄞a", "ab"]


# ----------------------------------------------------------- fuzz


def test_fuzz_vs_scalar():
    rng = random.Random(7)
    alpha = "abcde𝄞é"
    for trial in range(300):
        toks = []
        pos = 0
        for _ in range(rng.randrange(0, 8)):
            pos += rng.randrange(1, 3)  # holes in the stream
            toks.append(
                ("".join(rng.choice(alpha) for _ in range(rng.randrange(1, 7))), pos)
            )
        mn = rng.randrange(1, 5)
        mx = mn + rng.randrange(0, 3)
        edge = rng.random() < 0.5
        pres = rng.random() < 0.5
        want = canon(scalar_ngram(toks, mn, mx, edge=edge, preserve=pres))
        got = canon(run_vec(toks, mn, mx, edge=edge, preserve=pres))
        assert got == want, (trial, toks, mn, mx, edge, pres)
