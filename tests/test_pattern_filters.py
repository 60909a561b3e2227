"""PatternCaptureGroupTokenFilter / PatternReplaceFilter vs the
reference goldens (``TestPatternCaptureGroupTokenFilter.java``,
``TestPatternReplaceFilter.java``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_solr_spark.functions.token_filters import (
    apply_token_filters,
    pattern_captures,
)


def caps(term, patterns, preserve):
    return pattern_captures(term, patterns, preserve)


def texts(term, patterns, preserve):
    return [t for t, _ in caps(term, patterns, preserve)]


def test_no_pattern_no_match_no_capture():
    for pats in ([], ["xx"], [".."]):
        assert texts("foobarbaz", pats, False) == ["foobarbaz"]
        assert texts("foobarbaz", pats, True) == ["foobarbaz"]


def test_capture_all():
    # whole-token capture: replaces (no-op) without preserve, skipped
    # with preserve
    assert texts("foobarbaz", ["(.+)"], False) == ["foobarbaz"]
    assert texts("foobarbaz", ["(.+)"], True) == ["foobarbaz"]


def test_multi_capture_overlap():
    want = ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]
    got = caps("foobarbaz", ["(.(.(.)))"], False)
    assert [t for t, _ in got] == want
    assert [ov for _, ov in got] == [False] + [True] * 8
    got = texts("foobarbaz", ["(.(.(.)))"], True)
    assert got == ["foobarbaz"] + want


def test_multi_pattern():
    assert texts("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"], False) == [
        "aaa", "bbb", "aaa",
    ]
    assert texts("aaabbbaaa", ["(aaa)", "(bbb)", "(ccc)"], True) == [
        "aaabbbaaa", "aaa", "bbb", "aaa",
    ]


def test_camel_case():
    pats = [
        "([A-Z]{2,})",
        "(?<![A-Z])([A-Z][a-z]+)",
        "(?:^|\\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
        "([0-9]+)",
    ]
    assert texts("letsPartyLIKEits1999_dude", pats, False) == [
        "lets", "Party", "LIKE", "its", "1999", "dude",
    ]
    assert texts("letsPartyLIKEits1999_dude", pats, True) == [
        "letsPartyLIKEits1999_dude", "lets", "Party", "LIKE", "its",
        "1999", "dude",
    ]


def run_batch(tokens, specs):
    d, t, p, o = apply_token_filters(
        np.array([a for a, _, _ in tokens], np.int64),
        pa.array([b for _, b, _ in tokens], pa.string()),
        np.array([c for _, _, c in tokens], np.int64),
        specs,
    )
    ov = [None] * len(d) if o is None else [bool(x) for x in o]
    return list(zip(t.to_pylist(), p.tolist(), ov))


def test_pattern_replace_goldens():
    # TestPatternReplaceFilter semantics: first-only vs all
    toks = [(0, "aabfooaabfooabfoob", 0)]
    got = run_batch(toks, (("pattern_replace", "a*b", "-", True),))
    assert got[0][0] == "-foo-foo-foo-"
    got = run_batch(toks, (("pattern_replace", "a*b", "-", False),))
    assert got[0][0] == "-fooaabfooabfoob"
    # null replacement = delete
    got = run_batch(toks, (("pattern_replace", "a*b", None, True),))
    assert got[0][0] == "foofoofoo"


def test_pattern_capture_batch_stacks():
    got = run_batch(
        [(0, "foobarbaz", 0), (0, "xx", 1)],
        (("pattern_capture", ("(foo)", "(baz)"), True),),
    )
    assert got == [
        ("foobarbaz", 0, False),
        ("foo", 0, True),
        ("baz", 0, True),
        ("xx", 1, False),
    ]
