"""ComplexPhraseQueryParser vs the reference's TestComplexPhraseQuery
goldens (queryparser/complexPhrase/TestComplexPhraseQuery.java:38-108)
evaluated over the reference test's own corpus."""

from __future__ import annotations

import pytest

from lucene_solr_spark.oracle.engine import OracleIndex
from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.complex_phrase import (
    ComplexPhraseParseError,
    parse_complex_phrase,
)

DOCS = {
    1: "john smith",
    2: "johathon smith",
    3: "john percival smith",
    4: "jackson waits tom",
    5: "johny perkins",
    6: "hapax neverson",
    7: "dog cigar",
    8: "dogs don't smoke cigarettes",
}

GOLDENS = [
    ('"john smith"', {1}),
    ('"j* smyth~"', {1, 2}),
    ('"(jo* -john) smith"', {2}),
    ('"jo* smith"~2', {1, 2, 3}),
    ('"jo* [sma TO smZ]"', {1, 2}),
    ('"john"', {1, 3}),
    ('"(john OR johathon) smith"', {1, 2}),
    ('"(john OR nosuchword*) smith"', {1}),
    ('"(jo* -john) smyth~"', {2}),
    ('"john nosuchword*"', set()),
    ('"joh*"', {1, 2, 3, 5}),
    ('"joh~"', {1, 3, 5}),
    ('"joh*" "tom"', {1, 2, 3, 4, 5}),
    ('+"j*" +"tom"', {4}),
    ('+"j*hn" +"sm*h"', {1, 3}),
    ('"smith jo*"~2', set()),  # ordered proximity
]


@pytest.fixture(scope="module")
def db():
    return OracleIndex(DOCS.items())


@pytest.mark.parametrize("query,expected", GOLDENS)
def test_reference_goldens(db, query, expected):
    # the reference test sets fuzzyPrefixLength(1) ('usually a good idea')
    q = parse_complex_phrase(query, fuzzy_prefix_length=1)
    assert set(db.matches(q)) == expected, query


def test_plain_phrase_stays_phrase_query():
    q = parse_complex_phrase('"john smith"')
    assert isinstance(q, ir.PhraseQuery)
    q = parse_complex_phrase('"jo* smith"')
    assert isinstance(q, ir.SpanNearClauseQuery) and q.in_order


def test_bad_queries():
    with pytest.raises(ComplexPhraseParseError):
        parse_complex_phrase('"jo* id:1 smith"')  # field inside phrase
    with pytest.raises(ComplexPhraseParseError):
        parse_complex_phrase('"(  -john ) smith"')  # purely negative group
    with pytest.raises(ComplexPhraseParseError):
        parse_complex_phrase("-john")  # pure negative query


def test_outside_phrase_classic_operators(db):
    q = parse_complex_phrase('+smith -percival')
    assert set(db.matches(q)) == {1, 2}
    q = parse_complex_phrase("john perkins")  # bare words OR together
    assert set(db.matches(q)) == {1, 3, 5}
