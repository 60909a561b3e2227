"""Czech + Bulgarian analyzer chains (oracle.lang_pack).

Evidence model: the reference ships no full-vocabulary files for these
two CLEF stemmers, so the goldens are the reference's OWN unit tests —
every ``assertAnalyzesTo`` pair in TestCzechStemmer (143),
TestBulgarianStemmer (101), and the analyzer-level tests — parsed from
the Java sources at test time, plus alphabet fuzz proving the DuckDB
SQL twins ≡ the Python stemmers on inputs far outside the goldens.
"""

from __future__ import annotations

import random
import re

import pytest

from lucene_solr_spark.oracle.lang_pack import (
    BULGARIAN_SQL,
    BULGARIAN_STOP_WORDS,
    CZECH_SQL,
    CZECH_STOP_WORDS,
    bulgarian_stem,
    czech_stem,
)
from lucene_solr_spark.oracle.light_stemmers import analyzer_config, resolve
from lucene_solr_spark.oracle.tokenizer import analyze

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"

_ASSERT_RE = re.compile(
    r'assertAnalyzesTo\(\s*\w+\s*,\s*"([^"]+)"\s*,'
    r'\s*new String\[\]\s*\{([^}]*)\}\)',
    re.S,
)


def _analyzer_goldens(rel: str) -> list[tuple[str, list[str]]]:
    txt = open(f"{_REF}/{rel}", encoding="utf-8").read()
    out = []
    for text, terms in _ASSERT_RE.findall(txt):
        out.append((text, re.findall(r'"([^"]*)"', terms)))
    return out


def _chain(name: str):
    cfg = analyzer_config(name)
    stop = cfg["stopwords"]
    stem = resolve(cfg["stemmer"])

    def run(text: str) -> list[str]:
        return [
            t.term
            for t in analyze(text, stopwords=stop, stemmer=cfg["stemmer"])
        ]

    return run, stop, stem


def test_czech_stemmer_goldens():
    """Every TestCzechStemmer assertAnalyzesTo pair (the analyzer
    lowercases before the stem filter; the stemmer tests use no
    stopwords-filtered inputs)."""
    pairs = _analyzer_goldens("cz/TestCzechStemmer.java")
    assert len(pairs) >= 140
    for word, expected in pairs:
        if len(expected) != 1:
            continue
        got = czech_stem(word.lower())
        assert got == expected[0], (word, got, expected)


def test_bulgarian_stemmer_goldens():
    pairs = _analyzer_goldens("bg/TestBulgarianStemmer.java")
    assert len(pairs) >= 100
    for word, expected in pairs:
        if len(expected) != 1:
            continue
        got = bulgarian_stem(word.lower())
        assert got == expected[0], (word, got, expected)


def test_czech_analyzer_chain():
    """TestCzechAnalyzer.java:39-54 — full chain incl. the cz stop set
    ('Pokud', 'o' are stopwords; positions gap accordingly)."""
    run, _stop, _ = _chain("czech")
    assert run("Pokud mluvime o volnem") == ["mluvim", "voln"]
    assert run("Česká Republika") == ["česk", "republik"]
    # testWithStemExclusionSet (TestCzechAnalyzer.java:50-56): 'hole'
    # marked keyword via SetKeywordMarkerFilter, no stopwords
    toks = analyze("hole desek", stemmer="czech", stem_exclusions=frozenset({"hole"}))
    assert [t.term for t in toks] == ["hole", "desk"]


def test_czech_chain_positions_gap():
    toks = analyze(
        "Pokud mluvime o volnem",
        stopwords=CZECH_STOP_WORDS,
        stemmer="czech",
    )
    assert [(t.term, t.pos) for t in toks] == [("mluvim", 1), ("voln", 3)]


def test_bulgarian_analyzer_chain():
    """TestBulgarianAnalyzer.java:34-68."""
    run, _stop, _ = _chain("bulgarian")
    assert run("Как се казваш?") == ["казваш"]
    assert run("документи") == ["документ"]
    assert run("документ") == ["документ"]
    assert run("енергийни кризи") == ["енергийн", "криз"]
    assert run("Атомната енергия") == ["атомн", "енерг"]
    assert run("компютри") == ["компютр"]
    assert run("компютър") == ["компютр"]
    assert run("градове") == ["град"]
    # testWithStemExclusionSet (TestBulgarianAnalyzer.java:63-69):
    # 'строеве' marked keyword, no stopwords — the articled form still
    # stems (еве→й) while the bare form passes through
    toks = analyze(
        "строевете строеве",
        stemmer="bulgarian",
        stem_exclusions=frozenset({"строеве"}),
    )
    assert [t.term for t in toks] == ["строй", "строеве"]


_CZ_ALPHA = "abcdeěéichíkmnostuůvyáýžčš"
_BG_ALPHA = "абвгдеийконстцъщяover"


@pytest.mark.parametrize(
    "exprs, fn, alpha",
    [
        (CZECH_SQL, czech_stem, _CZ_ALPHA),
        (BULGARIAN_SQL, bulgarian_stem, _BG_ALPHA),
    ],
    ids=["czech", "bulgarian"],
)
def test_sql_twin_parity_fuzz(exprs, fn, alpha):
    """DuckDB SQL twin ≡ Python stemmer over 30k random words drawn
    from the suffix-relevant alphabet (lengths 1-12 hit every length
    guard) plus all reference golden inputs."""
    import duckdb

    rng = random.Random(42)
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 13)))
        for _ in range(30_000)
    ]
    for rel in ("cz/TestCzechStemmer.java", "bg/TestBulgarianStemmer.java"):
        words += [w.lower() for w, _e in _analyzer_goldens(rel)]
    con = duckdb.connect()
    con.execute("CREATE TABLE w AS SELECT unnest(?) AS term", [words])
    body = "SELECT term FROM w"
    for e in exprs:
        body = f"SELECT {e} AS term FROM ({body})"
    got = [r[0] for r in con.execute(body).fetchall()]
    bad = [(w, g, fn(w)) for w, g in zip(words, got) if g != fn(w)]
    assert not bad, bad[:10]


def test_stop_set_counts():
    """cz/stopwords.txt has 171 distinct entries, bg/stopwords.txt 190
    (after '#' comment stripping) — re-derived from the reference files
    so an embedding typo can't silently drop a word."""
    def load(path):
        out = set()
        for line in open(path, encoding="utf-8"):
            line = line.split("#")[0].strip()
            if line:
                out.add(line)
        return out

    res = "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis"
    assert CZECH_STOP_WORDS == load(f"{res}/cz/stopwords.txt")
    assert BULGARIAN_STOP_WORDS == load(f"{res}/bg/stopwords.txt")


def test_batch_kernel_matches_scalar():
    """The vectorized batch tokenizer with stemmer='czech'/'bulgarian'
    ≡ the scalar oracle chain on mixed text."""
    from lucene_solr_spark.functions.fast_tokenizer import batch_tokenize

    texts = [
        "Pokud mluvime o volnem Česká Republika hole desek",
        "Как се казваш документи градове строевете строеве",
        "pánové hradem mužům soudcích kostmi písně",
        "",
    ]
    for name in ("czech", "bulgarian"):
        cfg = analyzer_config(name)
        doc_ids, terms, poss = batch_tokenize(
            texts,
            stopwords=cfg["stopwords"],
            stemmer=cfg["stemmer"],
        )
        scalar = []
        for i, t in enumerate(texts):
            for tok in analyze(
                t, stopwords=cfg["stopwords"], stemmer=cfg["stemmer"]
            ):
                scalar.append((i, tok.term, tok.pos))
        got = list(zip(doc_ids.tolist(), terms.tolist(), poss.tolist()))
        assert got == scalar
