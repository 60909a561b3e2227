"""Miscellaneous token filters (functions/token_filters.py) vs the
reference semantics: Length/Reverse/Truncate/Capitalization goldens and
the KeywordRepeat + RemoveDuplicates stack contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_solr_spark.functions.token_filters import (
    apply_token_filters,
    capitalize_term,
)


def run(tokens, specs):
    d, t, p, o = apply_token_filters(
        np.array([a for a, _, _ in tokens], np.int64),
        pa.array([b for _, b, _ in tokens], pa.string()),
        np.array([c for _, _, c in tokens], np.int64),
        specs,
    )
    ov = [None] * len(d) if o is None else [bool(x) for x in o]
    return list(zip(d.tolist(), t.to_pylist(), p.tolist(), ov))


def test_length_filter():
    # TestLengthFilter: "short toolong evenmuchlongertext a" keep [3,5]
    toks = [(0, w, i) for i, w in enumerate(
        ["short", "toolong", "evenmuchlongertext", "a"])]
    got = run(toks, (("length", 3, 5),))
    assert got == [(0, "short", 0, None)]  # gaps preserved via pos
    # UTF-16 code units: one supplementary char counts 2
    got = run([(0, "𝄞a", 0)], (("length", 3, 3),))
    assert [t for _, t, _, _ in got] == ["𝄞a"]
    got = run([(0, "𝄞a", 0)], (("length", 2, 2),))
    assert got == []


def test_reverse_filter():
    # TestReverseStringFilter: "Do have a nice day" → reversed terms
    toks = [(0, w, i) for i, w in enumerate(["Do", "have", "a", "nice", "day"])]
    got = run(toks, (("reverse",),))
    assert [t for _, t, _, _ in got] == ["oD", "evah", "a", "ecin", "yad"]
    # surrogate pairs stay intact (ReverseStringFilter.java:100-130)
    got = run([(0, "ab𝄞cd", 0)], (("reverse",),))
    assert got[0][1] == "dc𝄞ba"


def test_truncate_filter():
    # TestTruncateTokenFilter: length 5 prefix, shorter pass through
    toks = [(0, w, i) for i, w in enumerate(
        ["abcdefg", "1234567", "ab", "12"])]
    got = run(toks, (("truncate", 5),))
    assert [t for _, t, _, _ in got] == ["abcde", "12345", "ab", "12"]


def test_capitalization_default():
    # TestCapitalizationFilter default-config cases
    assert capitalize_term("kiTTEN") == "Kitten"
    assert capitalize_term("and") == "And"
    assert capitalize_term("") == ""
    # multi-word token: first word capitalized, rest lowered
    assert capitalize_term("hello THERE my Name is Ryan") == (
        "Hello there my name is ryan"
    )
    # the boundary index-skip quirk: of ".." the second dot is never
    # seen as a boundary, so ".B" is one (lowercased) word — delimiter
    # chars stay in the token text
    assert capitalize_term("a..B") == "A..b"


def test_keyword_repeat_stack():
    toks = [(0, "table", 0), (0, "batch", 1)]
    got = run(toks, (("keyword_repeat", "german_light"),))
    # 'table' differs under german_light → original + stem stacked at
    # one position (stem is the overlap); 'batch' is unchanged → the
    # RemoveDuplicates stage collapses the stack
    assert got == [
        (0, "table", 0, False),
        (0, "tabl", 0, True),
        (0, "batch", 1, False),
    ]


def test_compose_order():
    # filters apply in order: truncate(4) then reverse
    got = run([(0, "tables", 0)], (("truncate", 4), ("reverse",)))
    assert got[0][1] == "lbat"


# --------------------------------------- DictionaryCompoundWordTokenFilter

from lucene_solr_spark.functions.token_filters import (  # noqa: E402
    dictionary_decompose,
)

_SE_DICT = frozenset(
    "Bil Dörr Motor Tak Borr Slag Hammar Pelar Glas Ögon Fodral Bas Fiol"
    " Makare Gesäll Sko Vind Rute Torkare Blad".split()
)


def _flat(term, dic, **kw):
    return [t for t, _ in dictionary_decompose(term, dic, ignore_case=True, **kw)]


def test_compound_swedish_goldens():
    # TestCompoundWordTokenFilter.testDumbCompoundWordsSE (per token)
    cases = {
        "Bildörr": ["Bildörr", "Bil", "dörr"],
        "Bilmotor": ["Bilmotor", "Bil", "motor"],
        "Biltak": ["Biltak", "Bil", "tak"],
        "Slagborr": ["Slagborr", "Slag", "borr"],
        "Hammarborr": ["Hammarborr", "Hammar", "borr"],
        "Pelarborr": ["Pelarborr", "Pelar", "borr"],
        "Glasögonfodral": ["Glasögonfodral", "Glas", "ögon", "fodral"],
        "Basfiolsfodral": ["Basfiolsfodral", "Bas", "fiol", "fodral"],
        "Basfiolsfodralmakaregesäll": [
            "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral",
            "makare", "gesäll",
        ],
        "Skomakare": ["Skomakare", "Sko", "makare"],
        "Vindrutetorkare": ["Vindrutetorkare", "Vind", "rute", "torkare"],
        "Vindrutetorkarblad": ["Vindrutetorkarblad", "Vind", "rute", "blad"],
        "abba": ["abba"],  # < minWordSize: untouched
    }
    for term, want in cases.items():
        assert _flat(term, _SE_DICT) == want, term


def test_compound_longest_match_golden():
    dic = frozenset(_SE_DICT - {"Fiol"} | {"Fiols", "Fiolsfodral"})
    got = _flat("Basfiolsfodralmakaregesäll", dic, only_longest=True)
    assert got == [
        "Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral", "fodral",
        "makare", "gesäll",
    ]


def test_compound_overlap_flags_batch():
    got = run([(0, "Bildörr", 0), (0, "abba", 1)],
              (("dictionary_compound", _SE_DICT, 5, 2, 15, False, True),))
    assert got == [
        (0, "Bildörr", 0, False),
        (0, "Bil", 0, True),
        (0, "dörr", 0, True),
        (0, "abba", 1, False),
    ]
