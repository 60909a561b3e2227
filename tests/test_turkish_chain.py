"""Full TurkishAnalyzer chain parity (tr/TurkishAnalyzer.java:109-118):

    StandardTokenizer → ApostropheFilter → TurkishLowerCaseFilter →
    StopFilter(tr/stopwords.txt) → SnowballFilter(TurkishStemmer)

Pinned against the reference's OWN test goldens
(TestTurkishLowerCaseFilter.java incl. the decomposed combining-mark
forms, TestApostropheFilter.java, TestTurkishAnalyzer.java), plus
scalar-vs-batch kernel parity and the SQL fold twin re-verified in
DuckDB on combining-mark-free vocabulary.
"""

from __future__ import annotations

import random

from lucene_solr_spark.functions.fast_tokenizer import batch_tokenize
from lucene_solr_spark.oracle.light_stemmers import (
    TURKISH_FOLD_SQL,
    TURKISH_STOP_WORDS,
    analyzer_config,
    apostrophe_strip,
    turkish_lower,
)
from lucene_solr_spark.oracle.tokenizer import analyze

TR = analyzer_config("turkish")


def _terms(text, **cfg):
    return [(t.term, t.pos) for t in analyze(text, **cfg)]


def test_turkish_lowercase_composed():
    # TestTurkishLowerCaseFilter.testTurkishLowerCaseFilter
    assert turkish_lower("İSTANBUL") == "istanbul"
    assert turkish_lower("İZMİR") == "izmir"
    assert turkish_lower("ISPARTA") == "ısparta"


def test_turkish_lowercase_decomposed():
    # testDecomposed: I + COMBINING DOT ABOVE lowers to 'i', dot deleted
    assert turkish_lower("\u0049\u0307STANBUL") == "istanbul"
    assert turkish_lower("\u0049\u0307ZM\u0049\u0307R") == "izmir"
    # testDecomposed2: other combining marks between I and the dot --
    # U+0049 U+0316 U+0307 is canonically equiv to U+0130 U+0316
    assert turkish_lower("\u0049\u0316\u0307STANBUL") == "i\u0316stanbul"
    assert turkish_lower("I\u0316SPARTA") == "\u0131\u0316sparta"
    # testDecomposed3 + testEmptyTerm
    assert turkish_lower("\u0049\u0307") == "i"
    assert turkish_lower("") == ""


def test_apostrophe_filter():
    # TestApostropheFilter golden (whitespace-tokenized in the reference)
    for raw, want in [
        ("Türkiye'de", "Türkiye"),
        ("2003'te", "2003"),
        ("Gölü'nü", "Gölü"),
        ("Gölü’nü", "Gölü"),  # typographic apostrophe too
        ("gördüm", "gördüm"),
        ("'baş", ""),  # truncates at the FIRST apostrophe
    ]:
        assert apostrophe_strip(raw) == want


def test_analyzer_goldens():
    # TestTurkishAnalyzer.testBasics
    assert _terms("ağacı", **TR) == [("ağaç", 0)]
    assert _terms("ağaç", **TR) == [("ağaç", 0)]
    assert _terms("dolayı", **TR) == []  # stopword
    assert _terms("Kıbrıs'ta", **TR) == [("kıbrıs", 0)]
    assert _terms("Van Gölü'ne", **TR) == [("van", 0), ("göl", 1)]
    # testExclude
    got = _terms("ağacı", **{**TR, "stem_exclusions": frozenset({"ağacı"})})
    assert got == [("ağacı", 0)]


def test_stopword_positions_preserved():
    # 've' drops but consumes its position
    assert _terms("ağaç ve ağaç", **TR) == [("ağaç", 0), ("ağaç", 2)]


def test_batch_kernel_parity_mixed():
    rng = random.Random(7)
    words = [
        "Kıbrıs'ta", "Van", "Gölü'ne", "ağacı", "dolayı", "İSTANBUL",
        "ISPARTA", "İZMİR", "2003'te", "ve",
        "gördüm", "Türkiye’de", "İjoin'te", "Ihash", "scan'te",
        "☃", "İ", "I̖SPARTA",
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 10)))
        for _ in range(60)
    ]
    scalar = [[(t.term, t.pos) for t in analyze(x, **TR)] for x in texts]
    d, terms, pos = batch_tokenize(texts, **TR)
    got = [[] for _ in texts]
    for di, tm, p in zip(d.tolist(), terms.to_pylist(), pos.tolist()):
        got[di].append((tm, p))
    assert got == scalar


def test_fold_sql_twin():
    import duckdb

    words = [
        "Kıbrıs'ta", "Gölü’nü", "2003'te", "İSTANBUL", "ISPARTA",
        "İZMİR", "Ihash", "İjoin'te", "ve", "ağacı", "x", "",
        "I", "İ", "'baş", "AĞAÇ", "ÇĞÖŞÜ",
    ]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {TURKISH_FOLD_SQL} FROM (SELECT unnest(?) AS term)",
        [words],
    ).fetchall()
    want = [turkish_lower(apostrophe_strip(w)) for w in words]
    assert [g[0] for g in got] == want


def test_stop_set_matches_reference_count():
    assert len(TURKISH_STOP_WORDS) == 209
    assert {"ve", "dolayı", "için", "mı", "çünkü"} <= TURKISH_STOP_WORDS
