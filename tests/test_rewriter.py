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
