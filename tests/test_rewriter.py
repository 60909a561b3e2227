"""Rewrite rules vs BooleanQuery.rewrite semantics (BooleanQuery.java:236-503).
Every rewrite must also preserve oracle results (checked in the battery)."""

from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.rewriter import rewrite

T = ir.TermQuery
C = ir.BooleanClause
O = ir.Occur


def B(*cs, msm=0):
    return ir.BooleanQuery(tuple(cs), msm)


def test_empty_boolean_is_match_no_docs():
    assert isinstance(rewrite(B()), ir.MatchNoDocsQuery)


def test_single_clause_unwrap():
    assert rewrite(B(C(O.MUST, T("a")))) == T("a")
    assert rewrite(B(C(O.SHOULD, T("a")))) == T("a")
    assert rewrite(B(C(O.FILTER, T("a")))) == ir.ConstantScoreQuery(T("a"))
    assert isinstance(rewrite(B(C(O.MUST_NOT, T("a")))), ir.MatchNoDocsQuery)


def test_pure_negative_matches_nothing():
    q = B(C(O.MUST_NOT, T("a")), C(O.MUST_NOT, T("b")))
    assert isinstance(rewrite(q), ir.MatchNoDocsQuery)


def test_must_and_must_not_same_term():
    q = B(C(O.MUST, T("a")), C(O.MUST_NOT, T("a")))
    assert isinstance(rewrite(q), ir.MatchNoDocsQuery)


def test_must_not_matchall():
    q = B(C(O.MUST, T("a")), C(O.MUST_NOT, ir.MatchAllDocsQuery()))
    assert isinstance(rewrite(q), ir.MatchNoDocsQuery)


def test_dedup_filter_and_drop_filter_subsumed_by_must():
    q = B(C(O.MUST, T("a")), C(O.FILTER, T("a")), C(O.FILTER, T("b")), C(O.FILTER, T("b")))
    r = rewrite(q)
    assert isinstance(r, ir.BooleanQuery)
    assert r.by_occur(O.FILTER) == (T("b"),)


def test_filter_should_promotes_to_must():
    q = B(C(O.FILTER, T("a")), C(O.SHOULD, T("a")), C(O.SHOULD, T("b")))
    r = rewrite(q)
    assert isinstance(r, ir.BooleanQuery)
    assert T("a") in r.by_occur(O.MUST)
    assert r.by_occur(O.FILTER) == ()


def test_dedup_should_sums_boosts():
    q = B(C(O.SHOULD, T("a")), C(O.SHOULD, T("a")), C(O.SHOULD, T("b")))
    r = rewrite(q)
    assert isinstance(r, ir.BooleanQuery)
    assert ir.BoostQuery(T("a"), 2.0) in r.by_occur(O.SHOULD)


def test_flatten_nested_disjunction():
    inner = B(C(O.SHOULD, T("b")), C(O.SHOULD, T("c")))
    q = B(C(O.SHOULD, T("a")), C(O.SHOULD, inner))
    r = rewrite(q)
    assert isinstance(r, ir.BooleanQuery)
    assert set(r.by_occur(O.SHOULD)) == {T("a"), T("b"), T("c")}


def test_should_matchnodocs_dropped():
    q = B(C(O.SHOULD, T("a")), C(O.SHOULD, ir.MatchNoDocsQuery()))
    assert rewrite(q) == T("a")


def test_msm_unsatisfiable():
    q = B(C(O.SHOULD, T("a")), C(O.SHOULD, T("b")), msm=3)
    assert isinstance(rewrite(q), ir.MatchNoDocsQuery)


def test_boost_algebra():
    assert rewrite(ir.BoostQuery(ir.BoostQuery(T("a"), 2.0), 3.0)) == ir.BoostQuery(T("a"), 6.0)
    assert rewrite(ir.BoostQuery(T("a"), 1.0)) == T("a")


def test_ngram_phrase_rewrite_shape():
    """NGramPhraseQuery.java:42-77: keep grams at 0, n, 2n, … + last."""
    q = ir.NGramPhraseQuery(2, ("ab", "bc", "cd", "de", "ef"))
    r = rewrite(q)
    assert r == ir.PhraseQuery(("ab", "cd", "ef"), positions=(0, 2, 4))
    # last gram forced in even when off-stride
    q = ir.NGramPhraseQuery(3, ("ab", "bc", "cd", "de"))
    assert rewrite(q) == ir.PhraseQuery(("ab", "de"), positions=(0, 3))
    # short phrases / unigrams lower to the plain phrase
    assert rewrite(ir.NGramPhraseQuery(2, ("ab", "bc"))) == ir.PhraseQuery(
        ("ab", "bc")
    )
    assert rewrite(ir.NGramPhraseQuery(1, ("a", "b", "c"))) == ir.PhraseQuery(
        ("a", "b", "c")
    )


def test_ngram_phrase_match_set_equivalence():
    """On a true n-gram token stream the rewritten (pruned) phrase matches
    EXACTLY the docs of the full consecutive-gram phrase."""
    from lucene_solr_spark.oracle.engine import OracleIndex

    def grams(word):
        return " ".join(word[i : i + 2] for i in range(len(word) - 1))

    words = ["abcdef", "abcdeg", "zabcde", "abdcef", "xyabcd", "abcd"]
    ix = OracleIndex((i, grams(w)) for i, w in enumerate(words))
    target = "abcde"  # query grams: ab bc cd de
    full = ir.PhraseQuery(tuple(grams(target).split()))
    pruned = rewrite(ir.NGramPhraseQuery(2, tuple(grams(target).split())))
    assert pruned != full  # the rewrite actually dropped a stream
    docs_full = {sd.doc_id for sd in ix.search(full, k=100)}
    docs_pruned = {sd.doc_id for sd in ix.search(pruned, k=100)}
    assert docs_pruned == docs_full == {0, 1, 2}
