"""ClassicTokenizer / ClassicAnalyzer vs the reference goldens
(``TestClassicAnalyzer.java``)."""

from __future__ import annotations

from lucene_solr_spark.functions.classic import (
    ACRONYM,
    ALPHANUM,
    HOST,
    NUM,
    batch_classic_tokenize,
    classic_tokenize,
)
from lucene_solr_spark.oracle.tokenizer import ENGLISH_STOP_WORDS


def analyze(text):
    # ClassicAnalyzer chain: tokenizer → ClassicFilter → lower → stop
    d, t, p = batch_classic_tokenize(
        [text], stopwords=frozenset(ENGLISH_STOP_WORDS)
    )
    return t.to_pylist()


def types(text):
    return [typ for _, typ, _ in classic_tokenize(text)]


def test_various_text():
    assert analyze("C embedded developers wanted") == [
        "c", "embedded", "developers", "wanted",
    ]
    assert analyze("foo bar FOO BAR") == ["foo", "bar", "foo", "bar"]
    assert analyze("foo      bar .  FOO <> BAR") == [
        "foo", "bar", "foo", "bar",
    ]
    assert analyze('"QUOTED" word') == ["quoted", "word"]


def test_acronyms_and_cplusplus():
    assert analyze("U.S.A.") == ["usa"]
    assert types("U.S.A.") == [ACRONYM]
    assert analyze("C++") == ["c"]
    assert analyze("C#") == ["c"]


def test_korean_vs_cj():
    # Korean stays whole (in [:letter:]); CJK splits to CJ single chars
    assert analyze("안녕하세요 한글입니다") == ["안녕하세요", "한글입니다"]


def test_host_compliance():
    assert analyze("2004.jpg") == ["2004.jpg"]
    assert types("2004.jpg") == [HOST]
    assert analyze("62.46") == ["62.46"]
    assert types("62.46") == [HOST]
    assert analyze("www.nutch.org") == ["www.nutch.org"]
    # LUCENE-1068: trailing dot → ACRONYM_DEP retyped HOST, dot dropped
    assert analyze("www.nutch.org.") == ["www.nutch.org"]
    assert types("www.nutch.org.") == [HOST]


def test_numeric():
    assert analyze("21.35") == ["21.35"]
    assert analyze("R2D2 C3PO") == ["r2d2", "c3po"]
    assert analyze("216.239.63.104") == ["216.239.63.104"]
    assert analyze("1-2-3") == ["1-2-3"]
    assert analyze("a1-b2-c3") == ["a1-b2-c3"]
    assert analyze("a1-b-c3") == ["a1-b-c3"]
    assert types("978-0-94045043-1") == [NUM]
    assert analyze("978-0-94045043-1") == ["978-0-94045043-1"]


def test_apostrophes():
    assert analyze("O'Reilly") == ["o'reilly"]
    assert analyze("you're") == ["you're"]
    assert analyze("she's") == ["she"]
    assert analyze("Jim's") == ["jim"]
    assert analyze("don't") == ["don't"]
    assert analyze("O'Reilly's") == ["o'reilly"]
    assert analyze("s-class") == ["s", "class"]


def test_company_names():
    assert analyze("AT&T") == ["at&t"]
    assert analyze("Excite@Home") == ["excite@home"]


def test_email_addresses():
    assert analyze("test@example.com") == ["test@example.com"]
    assert analyze("first.lastname@example.com") == [
        "first.lastname@example.com"
    ]
    assert analyze("first_lastname@example.com") == [
        "first_lastname@example.com"
    ]


def test_gaps_and_positions():
    # stopword gap: positions preserved across the stop filter
    d, t, p = batch_classic_tokenize(
        ["foo the bar"], stopwords=frozenset(ENGLISH_STOP_WORDS)
    )
    assert t.to_pylist() == ["foo", "bar"]
    assert p.tolist() == [0, 2]
    # overlong skip leaves a gap
    d, t, p = batch_classic_tokenize(
        ["a " + "x" * 300 + " b"], stopwords=frozenset()
    )
    assert t.to_pylist() == ["a", "b"]
    assert p.tolist() == [0, 2]


def test_type_priorities():
    assert types("usa") == [ALPHANUM]
    assert types("a1-b2") == [NUM]
