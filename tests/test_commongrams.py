"""CommonGramsFilter / CommonGramsQueryFilter vs the reference goldens
(``TestCommonGramsFilter.java``) — index-side stream shape in the
absolute-position model and the query-side hold-one automaton."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from lucene_solr_spark.functions.commongrams import (
    add_common_grams,
    common_grams_query,
)

COMMON = frozenset({"s", "of", "the"})


def run_index(tokens, common=COMMON):
    doc_idx = np.array([d for d, _, _ in tokens], np.int64)
    terms = pa.array([t for _, t, _ in tokens], pa.string())
    pos = np.array([p for _, _, p in tokens], np.int64)
    d, t, p, o = add_common_grams(doc_idx, terms, pos, common)
    return sorted(zip(d.tolist(), t.to_pylist(), p.tolist(), [bool(x) for x in o]))


def stream(words):
    return [(0, w, i) for i, w in enumerate(words)]


# ------------------------------------------------ index filter goldens


def test_index_no_commons():
    # "brown fox" → unigrams only
    got = run_index(stream(["brown", "fox"]))
    assert got == sorted([(0, "brown", 0, False), (0, "fox", 1, False)])


def test_index_pair_goldens():
    # TestCommonGramsFilter.testCommonGramsFilter two-word cases:
    # gram at the LEFT member's position, overlap (posIncr 0)
    assert run_index(stream(["the", "fox"])) == sorted(
        [(0, "the", 0, False), (0, "the_fox", 0, True), (0, "fox", 1, False)]
    )
    assert run_index(stream(["fox", "of"])) == sorted(
        [(0, "fox", 0, False), (0, "fox_of", 0, True), (0, "of", 1, False)]
    )


def test_index_nsn():
    # "n s n" → n, n_s, s, s_n, n
    got = run_index(stream(["n", "s", "n"]))
    assert got == sorted(
        [
            (0, "n", 0, False),
            (0, "n_s", 0, True),
            (0, "s", 1, False),
            (0, "s_n", 1, True),
            (0, "n", 2, False),
        ]
    )


def test_index_doc_boundary():
    # adjacency never crosses documents
    toks = [(0, "the", 0), (1, "fox", 0)]
    got = run_index(toks)
    assert got == sorted([(0, "the", 0, False), (1, "fox", 0, False)])


def test_index_case_sensitive():
    # testCaseSensitive: set lookup is exact ("The" with lowercase set
    # stays unigram-only when case differs)
    got = run_index(stream(["The", "fox"]), frozenset({"the"}))
    assert got == sorted([(0, "The", 0, False), (0, "fox", 1, False)])


# ------------------------------------------------ query filter goldens


def q(words):
    return common_grams_query(list(words), COMMON)


def test_query_goldens():
    # TestCommonGramsFilter.testCommonGramsQueryFilter, verbatim
    assert q(["brown", "fox"]) == ["brown", "fox"]
    assert q(["the", "fox"]) == ["the_fox"]
    assert q(["fox", "of"]) == ["fox_of"]
    assert q(["of", "the"]) == ["of_the"]
    assert q(["the"]) == ["the"]
    assert q(["foo"]) == ["foo"]
    assert q(["n", "n", "n"]) == ["n", "n", "n"]
    assert q(["quick", "brown", "fox"]) == ["quick", "brown", "fox"]
    assert q(["n", "n", "s"]) == ["n", "n_s"]
    assert q(["quick", "brown", "the"]) == ["quick", "brown_the"]
    assert q(["n", "s", "n"]) == ["n_s", "s_n"]
    assert q(["quick", "the", "brown"]) == ["quick_the", "the_brown"]
    assert q(["n", "s", "s"]) == ["n_s", "s_s"]
    assert q(["fox", "of", "the"]) == ["fox_of", "of_the"]
    assert q(["s", "n", "n"]) == ["s_n", "n", "n"]
    assert q(["the", "quick", "brown"]) == ["the_quick", "quick", "brown"]
    assert q(["s", "n", "s"]) == ["s_n", "n_s"]
    assert q(["the", "fox", "of"]) == ["the_fox", "fox_of"]
    assert q(["s", "s", "n"]) == ["s_s", "s_n"]
    assert q(["of", "the", "fox"]) == ["of_the", "the_fox"]
    assert q(["s", "s", "s"]) == ["s_s", "s_s"]
    assert q(["of", "the", "of"]) == ["of_the", "the_of"]


def test_query_one_word_stopword():
    # testOneWordQueryStopWord / testOneWordQuery
    assert q(["the"]) == ["the"]
    assert q(["fox"]) == ["fox"]


def test_query_covers_every_input_word():
    # every input word appears in some output term (no term lost)
    rng = random.Random(3)
    vocab = ["s", "of", "the", "n", "fox", "quick"]
    for _ in range(500):
        words = [rng.choice(vocab) for _ in range(rng.randrange(1, 7))]
        out = q(words)
        assert out, words
        joined = "_".join(out)
        for w in words:
            assert w in joined.split("_"), (words, out)
