"""BM25 float32 bit-parity + oracle engine semantics.

Hand-computed expectations follow BM25Similarity.java:104-107 (idf),
:114-117 (avgdl), :211-214 (cache), :242 (weight), :246-258 (score),
HitQueue.java:78-84 (tie-break)."""

import math
import struct

import numpy as np

from lucene_solr_spark.oracle import bm25
from lucene_solr_spark.oracle.engine import OracleIndex
from lucene_solr_spark.plans import ir


def f32bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def test_idf_exact_float32():
    # idf = (float) ln(1 + (N - n + 0.5)/(n + 0.5))
    for df, n in [(1, 1), (1, 100), (3, 100), (50, 100), (100, 100)]:
        expected = np.float32(math.log(1 + (n - df + 0.5) / (df + 0.5)))
        assert f32bits(bm25.idf(df, n)) == f32bits(expected)


def test_idf_sum_double_accumulate_then_cast():
    dfs, n = [3, 7, 11], 1000
    acc = 0.0
    for df in dfs:
        acc += float(np.float32(math.log(1 + (n - df + 0.5) / (df + 0.5))))
    assert f32bits(bm25.idf_sum(dfs, n)) == f32bits(np.float32(acc))


def test_cache_evaluation_order():
    avgdl = np.float32(57.375)
    cache = bm25.norm_inverse_cache(1.2, 0.75, avgdl)
    assert cache.dtype == np.float32
    lt = bm25.LENGTH_TABLE_F32
    for i in [0, 1, 24, 39, 40, 128, 255]:
        expected = np.float32(1.0) / (
            np.float32(1.2)
            * (
                (np.float32(1.0) - np.float32(0.75))
                + (np.float32(0.75) * lt[i]) / avgdl
            )
        )
        assert f32bits(cache[i]) == f32bits(expected)


def test_score_float32_order():
    avgdl = np.float32(100.0)
    cache = bm25.norm_inverse_cache(1.2, 0.75, avgdl)
    w = bm25.term_weight(1.0, bm25.idf(5, 1000))
    for freq, nb in [(1, 10), (3, 100), (17, 255), (2, 0)]:
        got = bm25.score(freq, nb, weight=w, cache=cache)
        expected = np.float32(w) - np.float32(w) / (
            np.float32(1.0) + np.float32(freq) * cache[nb]
        )
        assert f32bits(got) == f32bits(expected)
    # norm byte 0 → length 0 → cache = 1/(k1*(1-b)) finite, score defined
    assert np.isfinite(bm25.score(2, 0, weight=w, cache=cache))


def test_score_monotone_in_freq_and_inverse_in_length():
    cache = bm25.norm_inverse_cache(1.2, 0.75, np.float32(50.0))
    w = bm25.term_weight(1.0, bm25.idf(10, 500))
    s = bm25.score(np.arange(1, 100), np.full(99, 50), weight=w, cache=cache)
    assert (np.diff(s) >= 0).all()
    s2 = bm25.score(np.full(200, 3), np.arange(40, 240), weight=w, cache=cache)
    assert (np.diff(s2) <= 0).all()


DOCS = [
    (0, "spark index merge index"),
    (1, "index the spark"),
    (2, "merge merge merge query"),
    (3, "spark spark index query merge"),
    (4, "unrelated words here"),
]


def _oracle():
    return OracleIndex(DOCS)


def test_term_query_matches_manual():
    ix = _oracle()
    assert ix.doc_count == 5
    assert ix.sum_ttf == 4 + 3 + 4 + 5 + 3
    assert ix.df("index") == 3
    assert ix.ttf("merge") == 1 + 3 + 1
    res = ix.search(ir.TermQuery("index"), k=10)
    assert [r.doc_id for r in res] == sorted(
        [0, 1, 3],
        key=lambda d: (-ix.matches(ir.TermQuery("index"))[d], d),
    )
    # manual score for doc 0: tf=2, len=4
    w = bm25.term_weight(1.0, bm25.idf(3, 5))
    from lucene_solr_spark.oracle.smallfloat import int_to_byte4

    expected = bm25.score(2, int_to_byte4(4), weight=w, cache=ix.cache)
    assert f32bits(res[0].score if res[0].doc_id == 0 else dict((r.doc_id, r.score) for r in res)[0]) == f32bits(expected)


def test_boolean_and_is_intersection_sum():
    ix = _oracle()
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("spark")),
            ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("merge")),
        )
    )
    got = ix.matches(q)
    assert set(got) == {0, 3}
    ts = ix.matches(ir.TermQuery("spark"))
    tm = ix.matches(ir.TermQuery("merge"))
    for d in (0, 3):
        assert f32bits(got[d]) == f32bits(np.float32(float(ts[d]) + float(tm[d])))


def test_boolean_or_union_sum_and_tiebreak():
    ix = _oracle()
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("spark")),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("query")),
        )
    )
    got = ix.matches(q)
    assert set(got) == {0, 1, 2, 3}
    ranked = ix.search(q, k=10)
    scores = [r.score for r in ranked]
    assert scores == sorted(scores, reverse=True)
    # ties (if any) must be docID ascending
    for a, b in zip(ranked, ranked[1:]):
        if a.score == b.score:
            assert a.doc_id < b.doc_id


def test_must_not_and_filter():
    ix = _oracle()
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("index")),
            ir.BooleanClause(ir.Occur.MUST_NOT, ir.TermQuery("query")),
        )
    )
    assert set(ix.matches(q)) == {0, 1}
    qf = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("index")),
            ir.BooleanClause(ir.Occur.FILTER, ir.TermQuery("query")),
        )
    )
    got = ix.matches(qf)
    assert set(got) == {3}
    # FILTER adds no score
    assert f32bits(got[3]) == f32bits(ix.matches(ir.TermQuery("index"))[3])


def test_min_should_match():
    ix = _oracle()
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("spark")),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("index")),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("query")),
        ),
        min_should_match=2,
    )
    assert set(ix.matches(q)) == {0, 1, 3}


def test_phrase_query():
    ix = OracleIndex([(0, "big data small data"), (1, "data big"), (2, "big data big data")])
    got = ix.matches(ir.PhraseQuery(("big", "data")))
    assert set(got) == {0, 2}
    assert ix._phrase_freq(ir.PhraseQuery(("big", "data")), 2) == 2


def test_synonym_query_df_max_tf_sum():
    ix = _oracle()
    got = ix.matches(ir.SynonymQuery(("spark", "merge")))
    assert set(got) == {0, 1, 2, 3}
    w = bm25.term_weight(1.0, bm25.idf(3, 5))  # df = max(3, 3) = 3
    from lucene_solr_spark.oracle.smallfloat import int_to_byte4

    # doc 0: spark tf=1 + merge tf=1 = 2, len 4
    expected = bm25.score(2, int_to_byte4(4), weight=w, cache=ix.cache)
    assert f32bits(got[0]) == f32bits(expected)


def test_multiterm_expansion():
    ix = _oracle()
    assert ix.expand_multiterm(ir.PrefixQuery("me")) == ["merge"]
    assert ix.expand_multiterm(ir.WildcardQuery("*dex")) == ["index"]
    assert ix.expand_multiterm(ir.FuzzyQuery("querx", max_edits=1)) == ["query"]
    assert ix.expand_multiterm(ir.TermRangeQuery("index", "query")) == [
        "index",
        "merge",
        "query",
    ]
    got = ix.matches(ir.PrefixQuery("sp"))
    assert set(got) == {0, 1, 3} and all(v == np.float32(1.0) for v in got.values())


def test_dismax():
    ix = _oracle()
    q = ir.DisjunctionMaxQuery((ir.TermQuery("spark"), ir.TermQuery("merge")), tie_breaker=0.5)
    got = ix.matches(q)
    ts, tm = ix.matches(ir.TermQuery("spark")), ix.matches(ir.TermQuery("merge"))
    for d, v in got.items():
        sub = [float(s[d]) for s in (ts, tm) if d in s]
        expected = np.float32(max(sub) + (sum(sub) - max(sub)) * 0.5)
        assert f32bits(v) == f32bits(expected)
