"""SimpleQueryParser vs the reference's TestSimpleQueryParser goldens
(queryparser/simple/TestSimpleQueryParser.java)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.simple_parser import SimpleQueryParser, parse_simple

_T = ir.TermQuery
_O = ir.Occur


def _B(*pairs):
    return ir.BooleanQuery(tuple(ir.BooleanClause(o, q) for o, q in pairs))


def parse(text):  # the reference test helper uses MUST as default op
    return SimpleQueryParser(default_operator=_O.MUST).parse(text)


def test_term():
    assert parse("foobar") == _T("foobar")


def test_fuzzy():
    expected = ir.FuzzyQuery("foobar", max_edits=2, constant_score=False)
    assert parse("foobar~2") == expected
    assert parse("foobar~") == expected
    # non-numeric fuzziness degrades to the plain term
    assert parse("foobar~a") == _T("foobar")
    assert parse("foobar~1a") == _T("foobar")
    # edit distance caps at 2 (LevenshteinAutomata max)
    assert parse("foobar~3") == expected


def test_phrase():
    assert parse('"foo bar"') == ir.PhraseQuery(("foo", "bar"))


def test_phrase_with_slop():
    assert parse('"foo bar"~2') == ir.PhraseQuery(("foo", "bar"), slop=2)
    assert parse('"foo bar"~10') == ir.PhraseQuery(("foo", "bar"), slop=10)
    noslop = ir.PhraseQuery(("foo", "bar"))
    assert parse('"foo bar"~') == noslop
    assert parse('"foo bar"~a') == noslop
    assert parse('"foo bar"~1a') == noslop
    assert parse('"foo bar"~-1') == noslop
    # slop phrase composes with other tokens
    assert parse('"foo bar"~12 baz') == _B(
        (_O.MUST, ir.PhraseQuery(("foo", "bar"), slop=12)),
        (_O.MUST, _T("baz")),
    )


def test_prefix():
    assert parse("foobar*") == ir.PrefixQuery("foobar")


def test_and_or_not():
    assert parse("foo+bar") == _B((_O.MUST, _T("foo")), (_O.MUST, _T("bar")))
    assert parse("foo bar") == _B((_O.MUST, _T("foo")), (_O.MUST, _T("bar")))
    or_q = _B((_O.SHOULD, _T("foo")), (_O.SHOULD, _T("bar")))
    assert parse("foo|bar") == or_q
    assert parse("foo||bar") == or_q
    not_q = _B(
        (_O.MUST_NOT, _T("foo")), (_O.SHOULD, ir.MatchAllDocsQuery())
    )
    assert parse("-foo") == not_q
    assert parse("-(foo)") == not_q
    assert parse("---foo") == not_q
    assert parse("--foo") == _T("foo")  # double negation cancels


def test_default_operator_is_or():
    assert parse_simple("foo bar") == _B(
        (_O.SHOULD, _T("foo")), (_O.SHOULD, _T("bar"))
    )


def test_garbage_term():
    for text in (
        "star",
        "star\n",
        "star\r",
        "star\t",
        "star(",
        "star)",
        'star"',
        "\t \r\n\nstar   \n \r \t ",
        '- + "" - star \\',
    ):
        assert parse(text) == _T("star"), repr(text)


def test_garbage_empty():
    for text in ("", "  ", "\\ ", '""', '" "', '" "|" "', '(" "|" ")'):
        assert isinstance(parse(text), ir.MatchNoDocsQuery), repr(text)


def test_garbage_operators():
    and_q = _B((_O.MUST, _T("star")), (_O.MUST, _T("wars")))
    for text in (
        "star wars",
        "star+wars",
        "     star     wars   ",
        "     star +    wars   ",
        "  |     star + + |   wars   ",
        "  |     star + + |   wars   \\",
    ):
        assert parse(text) == and_q, repr(text)
    or_q = _B((_O.SHOULD, _T("star")), (_O.SHOULD, _T("wars")))
    for text in (
        "star|wars",
        "     star |    wars   ",
        "  |     star | + |   wars   ",
        "  +     star | + +   wars   \\",
    ):
        assert parse(text) == or_q, repr(text)


def test_precedence_right_to_left_fold():
    # a | b + c: the OR evaluates first, then ANDs with c
    got = parse("token1 | token2 + token3")
    assert got == _B(
        (
            _O.MUST,
            _B((_O.SHOULD, _T("token1")), (_O.SHOULD, _T("token2"))),
        ),
        (_O.MUST, _T("token3")),
    )


def test_parens_precedence():
    got = parse("token1 + (token2 | token3)")
    assert got == _B(
        (_O.MUST, _T("token1")),
        (
            _O.MUST,
            _B((_O.SHOULD, _T("token2")), (_O.SHOULD, _T("token3"))),
        ),
    )


def test_escapes():
    # crazy prefixes (TestSimpleQueryParser.java:216-233)
    assert parse("st*ar*") == ir.PrefixQuery("st*ar")
    assert parse("star\\*") == _T("star")  # 'star*' analyzes to 'star'
    assert parse("\\-term1") != _B(
        (_O.MUST_NOT, _T("term1")), (_O.SHOULD, ir.MatchAllDocsQuery())
    )


def test_match_all_star():
    assert parse("*") == ir.MatchAllDocsQuery()
    assert parse(" * ") == ir.MatchAllDocsQuery()


def test_multiword_token_analysis():
    # a token whose analysis yields several terms becomes a boolean of
    # the default operator (QueryBuilder.createBooleanQuery role)
    q = SimpleQueryParser(default_operator=_O.MUST).parse("foo.3.bar")
    # standard tokenizer keeps foo.3.bar? MidNumLet joins only between
    # letters; '3' splits it → three terms
    assert isinstance(q, (ir.BooleanQuery, ir.TermQuery))


def test_unbalanced_quote_and_paren():
    assert parse('"foo bar') == _B(
        (_O.MUST, _T("foo")), (_O.MUST, _T("bar"))
    )
    assert parse("(foo bar") == _B(
        (_O.MUST, _T("foo")), (_O.MUST, _T("bar"))
    )
