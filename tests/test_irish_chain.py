"""Full IrishAnalyzer chain parity (ga/IrishAnalyzer.java:120-128):

    StandardTokenizer → StopFilter(HYPHENATIONS h/n/t, ignore-case,
    position-preserving) → ElisionFilter(d/m/b) → IrishLowerCaseFilter
    → StopFilter(ga/stopwords.txt) → SnowballFilter(IrishStemmer)

Pinned against the reference's OWN test goldens
(TestIrishLowerCaseFilter.java, TestIrishAnalyzer.java), plus
scalar-vs-batch kernel parity, the offsets path, and the SQL twin
(IRISH_LOWER_SQL) re-verified in DuckDB against the Python fold.
"""

from __future__ import annotations

import random

from lucene_solr_spark.functions.fast_tokenizer import batch_tokenize
from lucene_solr_spark.functions.highlight import analyze_with_offsets
from lucene_solr_spark.oracle.light_stemmers import (
    IRISH_ARTICLES,
    IRISH_HYPHENATIONS,
    IRISH_LOWER_SQL,
    IRISH_STOP_WORDS,
    analyzer_config,
    irish_lower,
)
from lucene_solr_spark.oracle.tokenizer import analyze

GA = analyzer_config("irish")
GA_NOSTEM = {**GA, "stemmer": None}


def _terms(text, **cfg):
    return [(t.term, t.pos) for t in analyze(text, **cfg)]


def test_irish_lowercase_filter_goldens():
    # TestIrishLowerCaseFilter.java:30-38
    assert irish_lower("nAthair") == "n-athair"
    assert irish_lower("tUISCE") == "t-uisce"
    assert irish_lower("hARD") == "hard"  # 'h' never gains a hyphen
    assert irish_lower("") == ""  # testEmptyTerm
    # first char must be LOWERCASE n/t (chArray[0]=='n' is case-sensitive)
    assert irish_lower("NAthair") == "nathair"
    # second char must be an UPPERCASE vowel (incl. fada)
    assert irish_lower("tathair") == "tathair"
    assert irish_lower("nÁr") == "n-ár"
    assert irish_lower("tÚs") == "t-ús"


def test_analyzer_goldens():
    # TestIrishAnalyzer.testBasics
    assert _terms("siopadóireacht", **GA) == [("siopadóir", 0)]
    assert _terms("síceapatacha", **GA) == [("síceapaite", 0)]
    assert _terms("le", **GA) == []  # stopword
    # testContractions: b' and m' elide, with the fold AFTER elision
    assert _terms("b'fhearr m'athair", **GA) == [("fearr", 0), ("athair", 1)]
    # testHyphens: pre-hyphenated "n-athair" tokenizes as {n, athair};
    # the HYPHENATIONS stop drops 'n' but PRESERVES its position (the
    # reference asserts posIncrement 2), matching unhyphenated 'nAthair'
    assert _terms("n-athair", **GA) == [("athair", 1)]
    assert _terms("nAthair", **GA) == [("athair", 0)]
    # testExclude: stem exclusion skips stemming only
    got = _terms(
        "feirmeoireacht siopadóireacht",
        **{**GA, "stem_exclusions": frozenset({"feirmeoireacht"})},
    )
    assert got == [("feirmeoireacht", 0), ("siopadóir", 1)]


def test_hyphenation_stop_is_case_insensitive_and_pre_elision():
    # ignore-case CharArraySet: T / N / h all stop, positions kept
    assert _terms("T athair N uisce h deas", **GA_NOSTEM) == [
        ("athair", 1),
        ("uisce", 3),
        ("deas", 5),
    ]
    # elision output is NOT re-checked against HYPHENATIONS (the stop
    # runs before ElisionFilter in the reference chain): d'n → 'n' term
    assert _terms("d'n", **GA_NOSTEM) == [("n", 0)]


def test_elision_before_irish_fold():
    # "d'Ocht": elide first (so the fold sees 'Ocht' → plain lowercase,
    # no hyphen), THEN the Irish stop set drops 'ocht'
    assert _terms("d'Ocht", **GA_NOSTEM) == []
    # fold sees the original casing: nAon → n-aon (not in stop set;
    # 'aon' is, but 'n-aon' is checked pre-stem)
    assert _terms("m'Athair nUimhir", **GA_NOSTEM) == [
        ("athair", 0),
        ("n-uimhir", 1),
    ]


def test_batch_kernel_parity_mixed():
    rng = random.Random(42)
    words = [
        "nAthair", "tUISCE", "hARD", "b'fhearr", "m'athair", "d'Ocht",
        "n", "t", "h", "T", "N", "le", "agus", "siopadóireacht", "nÁr",
        "tÚs", "uisce", "n-athair", "deas", "agg", "bIg", "d'Order",
        "☃", "naïve", "İstanbul",  # slow-path routing cases
    ]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(0, 12)))
        for _ in range(60)
    ]
    scalar = [
        [(t.term, t.pos) for t in analyze(x, **GA)] for x in texts
    ]
    d, terms, pos = batch_tokenize(texts, **GA)
    got = [[] for _ in texts]
    for di, tm, p in zip(d.tolist(), terms.to_pylist(), pos.tolist()):
        got[di].append((tm, p))
    assert got == scalar


def test_offsets_path_parity():
    text = "nAthair b'fhearr T uisce le siopadóireacht"
    toks = analyze_with_offsets(text, **GA)
    # same (term, pos) stream as the non-offset chain
    assert [(t, p) for t, p, _s, _e in toks] == _terms(text, **GA)
    # offsets cover the ORIGINAL raw token spans
    for term, _p, s, e in toks:
        assert 0 <= s < e <= len(text)
    assert toks[0][2:] == (0, 7)  # nAthair span kept through fold+stem
    # batch with_offsets twin
    d, terms, pos, soff, eoff = batch_tokenize([text], **GA, with_offsets=True)
    assert list(zip(terms.to_pylist(), pos.tolist(), soff.tolist(), eoff.tolist())) == toks


def test_irish_lower_sql_twin():
    import duckdb

    words = [
        "nAthair", "tUISCE", "hARD", "NAthair", "tathair", "nÁr", "tÚs",
        "n", "t", "na", "ta", "nE", "tI", "nb", "Ocht", "bIg", "agg",
        "n-athair", "tÉan", "nÍon", "nÓr", "nÚll", "x", "",
    ]
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {IRISH_LOWER_SQL} FROM (SELECT unnest(?) AS term)",
        [words],
    ).fetchall()
    assert [g[0] for g in got] == [irish_lower(w) for w in words]


def test_config_sets_match_reference():
    assert IRISH_ARTICLES == frozenset({"d", "m", "b"})
    assert IRISH_HYPHENATIONS == frozenset({"h", "n", "t"})
    assert len(IRISH_STOP_WORDS) == 109
    assert {"b'", "d'", "m'", "le", "agus", "ón"} <= IRISH_STOP_WORDS


def test_build_index_named_analyzer(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.plans.ir import TermQuery

    docs = spark.createDataFrame(
        [
            (0, "nAthair uisce deas"),
            (1, "d'Athair eile"),
            (2, "n-athair agus t-uisce"),
            (3, "hARD le hARD"),
        ],
        ["doc_id", "text"],
    )
    ix = build_index(docs, text_col="text", doc_id_col="doc_id", analyzer="irish")
    ex = DFExecutor(ix)
    hits = ex.topk(TermQuery("athair"), k=10).collect()
    # doc 0 (nAthair → n-athair → athair), doc 1 (d'Athair → athair),
    # doc 2 (n [stopped] athair)
    assert sorted(r.doc_id for r in hits) == [0, 1, 2]
