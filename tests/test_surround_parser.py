"""Surround parser vs the reference's Test02Boolean / Test03Distance
goldens: every (query, expected docnrs) pair evaluated over the
reference tests' own corpus through the single-node oracle."""

from __future__ import annotations

import pytest

from lucene_solr_spark.oracle.engine import OracleIndex
from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.surround_parser import (
    SurroundParseError,
    parse_surround,
)

#: Test02Boolean.java / Test03Distance.java docs1
DOCS1 = [
    "word1 word2 word3",
    "word4 word5",
    "ord1 ord2 ord3",
    "orda1 orda2 orda3 word2 worda3",
    "a c e a b c",
]

BOOLEAN_GOLDENS = [
    ("word1", [0]),
    ("word*", [0, 1, 3]),
    ("ord2", [2]),
    ("kxork*", []),
    ("wor*", [0, 1, 3]),
    ("ab", []),
    ("abc?", []),
    ("word?", [0, 1, 3]),
    ("w?rd?", [0, 1, 3]),
    ("w*rd?", [0, 1, 3]),
    ("w*rd??", [3]),
    ("w*?da?", [3]),
    ("w?da?", []),
    ("word1 AND word2", [0]),
    ("word* and ord*", [3]),
    ("and(word1,word2)", [0]),
    ("word1 or word2", [0, 3]),
    ("word* OR ord*", [0, 1, 2, 3]),
    ("OR (word1, word2)", [0, 3]),
    ("word2 NOT word1", [3]),
    ("word2* not ord*", [0]),
    ("(word1 or ab)and or(word2,xyz, defg)", [0]),
    ("or( word2* not ord*, and(xyz,def))", [0]),
]

DISTANCE_GOLDENS = [
    ("word1 w word2", [0]),
    ("word1 n word2", [0]),
    ("word2 n word1", [0]),
    ("word2 w word1", []),
    ("word2 2W word1", []),
    ("word2 2N word1", [0]),
    ("word1 2N word2", [0]),
    ("word2 3w word1", []),
    ("word2 3n word1", [0]),
    ("word1 3n word2", [0]),
    ("orda1 w orda3", []),
    ("orda1 2w orda3", [3]),
    ("word1* w word2", [0]),
    ("word* w word2", [0]),
    ("word2 w word*", [0, 3]),
    ("word1* w word2*", [0]),
    ("word1* N word2*", [0]),
    ("word* n word2", [0, 3]),
    ("word2 n word*", [0, 3]),
    ("kxork* w kxor*", []),
    ("kxork* 99n kxor*", []),
    ("word2* 2W word1*", []),
    ("word2* 2N word1*", [0]),
    ("ord* W word*", [3]),
    ("ord* N word*", [3]),
    ("word* N ord*", [3]),
    ("(orda2 OR orda3) W word*", [3]),
    ("(orda2 OR orda3) W (word2 OR worda3)", [3]),
    ("(orda2 OR orda3) 2W (word2 OR worda3)", [3]),
    ("(orda2 OR orda3) 2N (word2 OR worda3)", [3]),
]


@pytest.fixture(scope="module")
def db1():
    return OracleIndex(enumerate(DOCS1))


@pytest.mark.parametrize("query,expected", BOOLEAN_GOLDENS)
def test_boolean_goldens(db1, query, expected):
    q = parse_surround(query)
    assert sorted(db1.matches(q)) == expected, query


@pytest.mark.parametrize("query,expected", DISTANCE_GOLDENS)
def test_distance_goldens(db1, query, expected):
    q = parse_surround(query)
    assert sorted(db1.matches(q)) == expected, query


def test_unordered_overlap_allows_shared_occurrence(db1):
    """NearSpansUnordered lets the SAME occurrence serve two clauses —
    a doc containing just 'word2' matches 'word* n word2'
    (spans/NearSpansUnordered.java width semantics)."""
    db = OracleIndex([(0, "zz word2 yy"), (1, "zz yy")])
    q = parse_surround("word* n word2")
    assert sorted(db.matches(q)) == [0]


def test_parse_shapes():
    assert parse_surround("word1") == ir.TermQuery("word1")
    assert parse_surround("wor*") == ir.PrefixQuery("wor")
    assert parse_surround("w?rd?") == ir.WildcardQuery("w?rd?")
    q = parse_surround("word1 3W word2")
    assert q == ir.SpanNearClauseQuery(
        (ir.SpanTermQuery("word1"), ir.SpanTermQuery("word2")),
        slop=2,
        in_order=True,
    )
    q = parse_surround("a n b")
    assert q.in_order is False and q.slop == 0
    # infix distance ops nest BINARY left-associatively (each operator
    # token builds its own pair — per-pair distance, not one window)
    q = parse_surround("a 3w b 3w c")
    assert len(q.clauses) == 2 and q.slop == 2
    assert isinstance(q.clauses[0], ir.SpanNearClauseQuery)
    assert q.clauses[0].slop == 2
    # the PREFIX distance form is n-ary (ComposedQuery operand list)
    q = parse_surround("w(a, b, c)")
    assert len(q.clauses) == 3 and q.slop == 0


def test_parse_errors():
    for bad in (
        "word1 word2",  # no operator between terms
        "word2 AND",
        "word1 OR",
        "AND(word2)",  # prefix op needs >= 2 operands
        "xx NOT",
        "(a AND b",
        "*",
        "",
    ):
        with pytest.raises(SurroundParseError):
            parse_surround(bad)


def test_w_binds_tighter_than_n_and_booleans():
    # a N b W c == a N (b W c) per the production ladder
    q = parse_surround("a N b W c")
    assert isinstance(q, ir.SpanNearClauseQuery) and q.in_order is False
    inner = q.clauses[1]
    assert isinstance(inner, ir.SpanNearClauseQuery) and inner.in_order
    # distance binds tighter than NOT/AND/OR
    q = parse_surround("a w b AND c")
    assert isinstance(q, ir.BooleanQuery)
    assert isinstance(q.clauses[0].query, ir.SpanNearClauseQuery)


def test_infix_distance_chain_is_per_pair():
    """'a 3w b 3w c' constrains each PAIR to distance 3 — doc
    'a x x b x x c' (each gap 3) matches, which the flat single-window
    reading (total span <= 3) would reject."""
    db = OracleIndex([(0, "a x1 x2 b y1 y2 c"), (1, "a b c"), (2, "a c b")])
    q = parse_surround("a 3w b 3w c")
    assert sorted(db.matches(q)) == [0, 1]
