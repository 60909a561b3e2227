"""Auxiliary analyzer pack (Whitespace / Simple / Keyword) — kernel vs
scalar reference parity, Java-predicate pins, and batching invariance.

Reference: analysis/core/{WhitespaceTokenizer,LetterTokenizer,
SimpleAnalyzer,KeywordAnalyzer}.java.
"""

import random

import numpy as np
import pytest

from lucene_solr_spark.functions.analyzers import (
    GRAMMARS,
    _scalar_tokenize,
    batch_tokenize_grammar,
)


def _flatten(texts, grammar, lowercase=False):
    tdoc, terms, pos = batch_tokenize_grammar(
        texts, grammar=grammar, lowercase=lowercase
    )
    return list(zip(tdoc.tolist(), terms.to_pylist(), pos.tolist()))


def _expected(texts, grammar, lowercase=False):
    out = []
    for i, t in enumerate(texts):
        t = "" if t is None else t
        for p, (tok, _, _) in enumerate(_scalar_tokenize(t, grammar)):
            out.append((i, tok.lower() if lowercase else tok, p))
    return out


def test_whitespace_basic():
    got = _flatten(["Brand#2/ECONOMY  small ring", "", "\tx\n y"], "whitespace")
    assert got == [
        (0, "Brand#2/ECONOMY", 0),
        (0, "small", 1),
        (0, "ring", 2),
        (2, "x", 0),
        (2, "y", 1),
    ]


def test_whitespace_java_predicate_pins():
    """Character.isWhitespace vs Python isspace: NBSP (U+00A0) and
    narrow NBSP (U+202F) are NOT whitespace in Java — a token spans
    them; U+001C..1F file separators ARE whitespace in Java."""
    got = _flatten(["a b c", "p q", "m\x1cn"], "whitespace")
    assert got == [
        (0, "a b", 0),
        (0, "c", 1),
        (1, "p q", 0),
        (2, "m", 0),
        (2, "n", 1),
    ]


def test_letter_grammar_and_lowercase():
    got = _flatten(["Brand#2/ECONOMY", "naïve Δx 1a2b"], "letter", lowercase=True)
    assert got == [
        (0, "brand", 0),
        (0, "economy", 1),
        (1, "naïve", 0),
        (1, "δx", 1),
        (1, "a", 2),
        (1, "b", 3),
    ]


def test_keyword_grammar():
    got = _flatten(["Whole Value #1", "", None, "x"], "keyword")
    assert got == [(0, "Whole Value #1", 0), (3, "x", 0)]


def test_astral_slow_path_matches_scalar():
    """Docs with codepoints past the fast LUT range reroute through the
    scalar scan: astral letters (Deseret U+10400) are isalpha, emoji
    U+1F600 is not; results must be identical to an all-scalar run."""
    texts = ["\U00010400ab cd", "x \U0001f600 y", "plain only"]
    for g in ("whitespace", "letter"):
        assert _flatten(texts, g) == _expected(texts, g), g


def test_fuzz_kernel_equals_scalar_all_grammars():
    rng = random.Random(42)
    alphabet = "aB3 \t\n#/ あé\U00010400\U0001f600 "
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(200)
    ]
    for g in GRAMMARS:
        for lc in (False, True):
            assert _flatten(texts, g, lc) == _expected(texts, g, lc), (g, lc)


def test_batching_invariance():
    """Tokenizing doc-by-doc equals tokenizing the whole batch — the
    '\\n' joiner never fuses or splits tokens across documents."""
    texts = ["a b", "Brand#2", "", "x y", "\U00010400z"]
    for g in GRAMMARS:
        whole = _flatten(texts, g)
        single = []
        for i, t in enumerate(texts):
            for d, term, p in _flatten([t], g):
                single.append((i, term, p))
        assert whole == single, g


def test_stop_filter_preserves_position_gaps():
    """StopAnalyzer semantics: removing 'b' keeps 'c' at raw position 2
    (StopFilter posInc), not re-compacted to 1."""
    tdoc, terms, pos = batch_tokenize_grammar(
        ["a b c", "b b d"],
        grammar="letter",
        lowercase=True,
        stopwords=frozenset({"b"}),
    )
    assert list(zip(tdoc.tolist(), terms.to_pylist(), pos.tolist())) == [
        (0, "a", 0),
        (0, "c", 2),
        (1, "d", 2),
    ]


def test_stop_filter_rejected_for_keyword():
    with pytest.raises(ValueError):
        batch_tokenize_grammar(
            ["x"], grammar="keyword", stopwords=frozenset({"x"})
        )


def test_unknown_grammar_rejected():
    with pytest.raises(ValueError):
        batch_tokenize_grammar(["x"], grammar="nope")


def test_positions_are_int32_dense_per_doc():
    tdoc, terms, pos = batch_tokenize_grammar(
        ["a b c", "d e"], grammar="whitespace"
    )
    assert pos.dtype == np.int32
    assert pos.tolist() == [0, 1, 2, 0, 1]
    assert tdoc.tolist() == [0, 0, 0, 1, 1]
