"""WordDelimiterGraphFilter — scalar expansion vs the reference goldens
(``TestWordDelimiterGraphFilter.java``) and the batch kernel vs the
scalar walk over random streams."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from lucene_solr_spark.functions.word_delimiter import (
    CATENATE_ALL,
    CATENATE_NUMBERS,
    CATENATE_WORDS,
    GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS,
    PRESERVE_ORIGINAL,
    SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE,
    WDGF_DEFAULT,
    apply_word_delimiter,
    batch_whitespace_tokenize,
    wdgf_parts,
)


def terms_of(term, flags=WDGF_DEFAULT, prot=None):
    got = wdgf_parts(term, flags, prot)
    return None if got is None else [t for t, _, _ in got[0]]


# --------------------------------------------------------- doSplit goldens


def test_splits_goldens():
    # TestWordDelimiterGraphFilter.testSplits (default doSplit flags)
    assert terms_of("basic-split") == ["basic", "split"]
    assert terms_of("camelCase") == ["camel", "Case"]
    assert terms_of("บ้าน") == ["บ้าน"]
    assert terms_of("test's'") == ["test"]
    assert terms_of("Роберт") == ["Роберт"]
    assert terms_of("РобЕрт") == ["Роб", "Ерт"]
    assert terms_of("aǅungla") == ["aǅungla"]
    assert terms_of("ســـــــــــــــــلام") == ["ســـــــــــــــــلام"]
    assert terms_of("test⃝") == ["test⃝"]
    assert terms_of("हिन्दी") == ["हिन्दी"]
    assert terms_of("١٢٣٤") == ["١٢٣٤"]
    assert terms_of("𠀀𠀀") == ["𠀀𠀀"]


def test_possessives_golden():
    # testPossessives: stemming flag on/off
    assert terms_of("ra's") == ["ra"]
    no_poss = (
        GENERATE_WORD_PARTS
        | GENERATE_NUMBER_PARTS
        | SPLIT_ON_CASE_CHANGE
        | SPLIT_ON_NUMERICS
    )
    assert terms_of("ra's", no_poss) == ["ra", "s"]


def test_token_type_golden():
    # testTokenType: foo-bar with CATENATE_ALL → foobar foo bar
    flags = WDGF_DEFAULT | CATENATE_ALL
    assert terms_of("foo-bar", flags) == ["foobar", "foo", "bar"]


def test_lots_of_concatenating_golden():
    # testLotsOfConcatenating: abc-def-123-456, all catenations —
    # terms in buffer-sorted order, posIncr 1 0 0 1 1 0 1
    flags = (
        GENERATE_WORD_PARTS
        | GENERATE_NUMBER_PARTS
        | CATENATE_WORDS
        | CATENATE_NUMBERS
        | CATENATE_ALL
        | SPLIT_ON_CASE_CHANGE
        | SPLIT_ON_NUMERICS
        | STEM_ENGLISH_POSSESSIVE
    )
    parts, shift = wdgf_parts("abc-def-123-456", flags)
    assert [t for t, _, _ in parts] == [
        "abcdef123456", "abcdef", "abc", "def", "123456", "123", "456",
    ]
    assert [p for _, p, _ in parts] == [0, 0, 0, 1, 2, 2, 3]
    assert [ov for _, _, ov in parts] == [
        False, True, True, False, False, True, False,
    ]
    assert shift == 3
    # testLotsOfConcatenating2: + PRESERVE_ORIGINAL, original first
    parts2, _ = wdgf_parts("abc-def-123-456", flags | PRESERVE_ORIGINAL)
    assert [t for t, _, _ in parts2] == [
        "abc-def-123-456", "abcdef123456", "abcdef", "abc", "def",
        "123456", "123", "456",
    ]
    assert [ov for _, _, ov in parts2] == [
        False, True, True, True, False, False, True, False,
    ]


def test_doc_examples():
    # WordDelimiterGraphFilter.java:66-76 javadoc examples
    assert terms_of("PowerShot", WDGF_DEFAULT | CATENATE_WORDS) == [
        "PowerShot", "Power", "Shot",
    ]
    # (the :72 javadoc shows the pre-graph WDF order "A B C ABC"; the
    # graph filter's PositionSorter puts the catenation first at its
    # START position — the testLotsOfConcatenating golden pins this)
    assert terms_of("A's+B's&C's", WDGF_DEFAULT | CATENATE_WORDS) == [
        "ABC", "A", "B", "C",
    ]
    parts, _ = wdgf_parts(
        "Super-Duper-XL500-42-AutoCoder!", WDGF_DEFAULT | CATENATE_WORDS
    )
    assert [(t, p) for t, p, _ in parts] == [
        ("SuperDuperXL", 0), ("Super", 0), ("Duper", 1), ("XL", 2),
        ("500", 3), ("42", 4), ("AutoCoder", 5), ("Auto", 5), ("Coder", 6),
    ]


def test_preserve_positions_golden():
    # testPositionIncrements: "SAL_S8371 - SAL" (whitespace stream),
    # PRESERVE_ORIGINAL, no possessive stemming
    flags = (
        SPLIT_ON_NUMERICS
        | GENERATE_WORD_PARTS
        | PRESERVE_ORIGINAL
        | GENERATE_NUMBER_PARTS
        | SPLIT_ON_CASE_CHANGE
    )
    d, t, p, o = apply_word_delimiter(
        np.zeros(3, np.int64),
        pa.array(["SAL_S8371", "-", "SAL"]),
        np.arange(3, dtype=np.int64),
        flags=flags,
    )
    assert t.to_pylist() == ["SAL_S8371", "SAL", "S", "8371", "-", "SAL"]
    assert p.tolist() == [0, 0, 1, 2, 3, 4]  # posIncr 1 0 1 1 1 1
    assert [bool(x) for x in o] == [False, True, False, False, False, False]


def test_protected_words_golden():
    # testProtectedWords semantics: protected tokens pass untouched
    assert terms_of("foo17-bar", WDGF_DEFAULT, frozenset({"foo17-bar"})) == [
        "foo17-bar"
    ]
    assert terms_of("foo17-bar", WDGF_DEFAULT) == ["foo", "17", "bar"]


def test_swallowed_token_leaves_hole():
    # "-" with no PRESERVE_ORIGINAL vanishes, hole preserved
    assert wdgf_parts("-", WDGF_DEFAULT) is None
    d, t, p, o = apply_word_delimiter(
        np.zeros(3, np.int64),
        pa.array(["aa", "-", "bb"]),
        np.arange(3, dtype=np.int64),
        flags=WDGF_DEFAULT,
    )
    assert t.to_pylist() == ["aa", "bb"]
    assert p.tolist() == [0, 2]


def test_only_numbers_golden():
    # testOnlyNumbers: "7-586" with word parts only, no number parts,
    # no catenation → everything vanishes
    flags = GENERATE_WORD_PARTS | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
    assert wdgf_parts("7-586", flags) is None


def test_curious_cases():
    # testCuriousCase1/2 shapes must not crash and produce sane graphs
    flags = (
        CATENATE_WORDS
        | CATENATE_ALL
        | GENERATE_WORD_PARTS
        | GENERATE_NUMBER_PARTS
        | STEM_ENGLISH_POSSESSIVE
        | PRESERVE_ORIGINAL
    )
    for term in ("u-0,500", "cmts-0-5%,par     et,q!!"):
        got = wdgf_parts(term, flags)
        assert got is not None and got[0]


def test_whitespace_tokenizer():
    d, t, p = batch_whitespace_tokenize(["a  bb\tccc", "", None, "x"])
    assert d.tolist() == [0, 0, 0, 3]
    assert t.to_pylist() == ["a", "bb", "ccc", "x"]
    assert p.tolist() == [0, 1, 2, 0]
    # maxTokenLen chunking (CharTokenizer semantics)
    d, t, p = batch_whitespace_tokenize(["abcdefgh"], max_token_length=3)
    assert t.to_pylist() == ["abc", "def", "gh"]


def test_batch_matches_scalar_fuzz():
    rng = random.Random(17)
    alpha = "aB9-'_ xY"
    flag_pool = [
        WDGF_DEFAULT,
        WDGF_DEFAULT | CATENATE_WORDS,
        WDGF_DEFAULT | CATENATE_NUMBERS,
        WDGF_DEFAULT | CATENATE_ALL | PRESERVE_ORIGINAL,
        GENERATE_WORD_PARTS | CATENATE_ALL,
        WDGF_DEFAULT | CATENATE_WORDS | CATENATE_NUMBERS | CATENATE_ALL,
    ]
    for trial in range(300):
        flags = rng.choice(flag_pool)
        toks, pos = [], 0
        for _ in range(rng.randrange(1, 6)):
            pos += rng.randrange(1, 3)
            w = "".join(
                rng.choice(alpha.replace(" ", "")) for _ in range(rng.randrange(1, 8))
            )
            toks.append((w, pos))
        d, t, p, o = apply_word_delimiter(
            np.zeros(len(toks), np.int64),
            pa.array([w for w, _ in toks]),
            np.array([q for _, q in toks], np.int64),
            flags=flags,
        )
        # scalar re-derivation: walk tokens, accumulate shifts
        want = []
        shift = 0
        for w, q in toks:
            got = wdgf_parts(w, flags)
            if got is None:
                continue
            parts, s = got
            for text, rel, ov in parts:
                want.append((text, q + shift + rel, ov))
            shift += s
        assert list(zip(t.to_pylist(), p.tolist(), [bool(x) for x in o])) == want, (
            trial,
            toks,
            flags,
        )
