"""Monitor (reverse search / percolator) — QueryDecomposer, QueryAnalyzer
anchor extraction, TermFilteredPresearcher candidates, and end-to-end
match verification, modeled on the reference's TestQueryDecomposer,
TestQueryAnalyzer, TestTermPresearcher, TestMultipassPresearcher and
TestMonitor (lucene/monitor/src/test/org/apache/lucene/monitor/)."""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.operators.monitor import (
    ANYTOKEN,
    DEFAULT_WEIGHTOR,
    Monitor,
    MonitorQuery,
    build_tree,
    decompose,
    length_weightor,
    term_freq_weightor,
)
from lucene_solr_spark.plans import ir

_T = ir.TermQuery
_O = ir.Occur


def _B(*pairs, msm=0):
    return ir.BooleanQuery(
        tuple(ir.BooleanClause(o, q) for o, q in pairs), min_should_match=msm
    )


def _collect(q, weightor=DEFAULT_WEIGHTOR):
    out: list[str] = []
    build_tree(q, weightor).collect_terms(out)
    return out


# ---------------------------------------------------------------- weightor


def test_default_weightor_is_length_based():
    # TermWeightor.java:122-134: 4 - float32(3*e^(-0.3*len))
    import numpy as np

    for t in ("a", "hello", "supercalifragilistic"):
        expected = 4.0 - float(
            np.float32(3.0 * math.exp(-0.3 * len(t.encode("utf-8"))))
        )
        assert DEFAULT_WEIGHTOR(t) == pytest.approx(expected, abs=0)
    # longer is heavier; >=32 bytes clamps
    assert DEFAULT_WEIGHTOR("xy") < DEFAULT_WEIGHTOR("xyz")
    assert DEFAULT_WEIGHTOR("a" * 32) == DEFAULT_WEIGHTOR("a" * 64)


def test_term_freq_weightor():
    w = term_freq_weightor({"the": 1000, "rare": 2}, 100.0, 0.5)
    assert w("the") == pytest.approx(100.0 / 1000 + 0.5)
    assert w("rare") == pytest.approx(100.0 / 2 + 0.5)
    assert w("unseen") == 1.0


# --------------------------------------------------------------- decomposer
# TestQueryDecomposer.java:36-110


def test_conjunctions_are_not_decomposed():
    q = _B((_O.MUST, _T("hello")), (_O.SHOULD, _T("world")))
    assert decompose(q) == [q]


def test_simple_and_nested_disjunctions():
    q = _B((_O.SHOULD, _T("hello")), (_O.SHOULD, _T("world")))
    assert decompose(q) == [_T("hello"), _T("world")]
    nested = _B(
        (_O.SHOULD, _B((_O.SHOULD, _T("hello")), (_O.SHOULD, _T("goodbye")))),
        (_O.SHOULD, _T("world")),
    )
    assert decompose(nested) == [_T("hello"), _T("goodbye"), _T("world")]


def test_exclusions_are_attached_to_every_part():
    q = _B(
        (_O.SHOULD, _T("hello")),
        (_O.SHOULD, _T("world")),
        (_O.MUST_NOT, _T("goodbye")),
    )
    expected = [
        _B((_O.MUST, _T("hello")), (_O.MUST_NOT, _T("goodbye"))),
        _B((_O.MUST, _T("world")), (_O.MUST_NOT, _T("goodbye"))),
    ]
    assert decompose(q) == expected


def test_single_valued_conjunction_is_unwrapped():
    q = _B((_O.MUST, _B((_O.SHOULD, _T("hello")), (_O.SHOULD, _T("world")))))
    assert decompose(q) == [_T("hello"), _T("world")]


def test_msm_is_not_decomposed():
    q = _B(
        (_O.SHOULD, _T("a")), (_O.SHOULD, _T("b")), (_O.SHOULD, _T("c")), msm=2
    )
    assert decompose(q) == [q]


def test_dismax_decomposition():
    q = ir.DisjunctionMaxQuery((_T("t1"), _T("t2")), 0.1)
    assert decompose(q) == [_T("t1"), _T("t2")]


def test_boosts_are_preserved():
    q = ir.BoostQuery(
        _B((_O.MUST, _B((_O.SHOULD, _T("hello")), (_O.SHOULD, _T("world"))))),
        0.7,
    )
    assert decompose(q) == [
        ir.BoostQuery(_T("hello"), 0.7),
        ir.BoostQuery(_T("world"), 0.7),
    ]


def test_filter_plus_should_not_decomposed():
    q = _B((_O.SHOULD, _T("should")), (_O.FILTER, _T("filter")))
    assert decompose(q) == [q]


# ---------------------------------------------------------- anchor extraction
# TestQueryAnalyzer semantics


def test_conjunction_picks_heaviest_term():
    q = _B((_O.MUST, _T("hi")), (_O.MUST, _T("helloworld")))
    assert _collect(q) == ["helloworld"]


def test_disjunction_collects_all_terms():
    q = _B((_O.SHOULD, _T("hi")), (_O.SHOULD, _T("helloworld")))
    assert sorted(_collect(q)) == ["helloworld", "hi"]


def test_should_ignored_when_must_present():
    q = _B((_O.MUST, _T("must")), (_O.SHOULD, _T("extralongshould")))
    assert _collect(q) == ["must"]


def test_pure_negative_is_anytoken():
    q = _B((_O.MUST_NOT, _T("no")))
    assert _collect(q) == [ANYTOKEN]


def test_phrase_is_conjunction_of_terms():
    q = ir.PhraseQuery(("tiny", "enormousterm"))
    assert _collect(q) == ["enormousterm"]


def test_multiphrase_slot_disjunction():
    # slot 2 is the heaviest MINIMUM: conj picks the slot whose lightest
    # alternative is heaviest? No — conj picks the heaviest CHILD, where
    # a disjunction's weight is its MINIMUM (QueryTree.java:255-258).
    q = ir.MultiPhraseQuery(((("aa", "bb")), ("elephantine", "gargantuan")))
    assert sorted(_collect(q)) == ["elephantine", "gargantuan"]


def test_multiterm_leaves_are_anytoken():
    assert _collect(ir.PrefixQuery("abc")) == [ANYTOKEN]
    assert _collect(ir.RegexpQuery("a.*")) == [ANYTOKEN]
    assert _collect(ir.FuzzyQuery("abcd")) == [ANYTOKEN]
    assert _collect(ir.MatchAllDocsQuery()) == [ANYTOKEN]


def test_any_disjunct_swallows_disjunction():
    q = _B((_O.SHOULD, _T("term")), (_O.SHOULD, ir.PrefixQuery("ab")))
    assert _collect(q) == [ANYTOKEN]


def test_conjunction_with_any_still_anchors_on_term():
    q = _B((_O.MUST, _T("term")), (_O.MUST, ir.PrefixQuery("ab")))
    assert _collect(q) == ["term"]


def test_terminset_single_vs_many():
    assert _collect(ir.TermInSetQuery(("only",))) == ["only"]
    assert _collect(ir.TermInSetQuery(("a", "b"))) == [ANYTOKEN]


def test_span_extraction():
    q = ir.SpanNearQuery(("alpha", "betagamma"), slop=2)
    assert _collect(q) == ["betagamma"]
    q2 = ir.SpanOrQuery((ir.SpanTermQuery("one"), ir.SpanTermQuery("twotwo")))
    assert sorted(_collect(q2)) == ["one", "twotwo"]


def test_synonym_is_disjunction():
    assert sorted(_collect(ir.SynonymQuery(("fast", "quickly")))) == [
        "fast",
        "quickly",
    ]


def test_multipass_advance_collects_next_path():
    # second pass of a conjunction anchors on the SECOND-heaviest child
    q = _B((_O.MUST, _T("lengthiestterm")), (_O.MUST, _T("shorter")))
    tree = build_tree(q, DEFAULT_WEIGHTOR)
    first: list[str] = []
    tree.collect_terms(first)
    assert first == ["lengthiestterm"]
    assert tree.advance_phase(0.0)
    second: list[str] = []
    tree.collect_terms(second)
    assert second == ["shorter"]
    assert not tree.advance_phase(0.0)


# ------------------------------------------------------------- registration


def _registration_terms(mon: Monitor):
    return {(r[0], r[1], r[2], r[3]) for r in mon._anchor_rows}


def test_monitor_registration_rows():
    mon = Monitor(
        {
            "q_or": _B((_O.SHOULD, _T("merge")), (_O.SHOULD, _T("window"))),
            "q_any": ir.PrefixQuery("s"),
        }
    )
    rows = _registration_terms(mon)
    assert ("q_or", 0, 0, "merge") in rows
    assert ("q_or", 1, 0, "window") in rows
    assert ("q_any", 0, 0, ANYTOKEN) in rows
    assert ("q_or", 0) in mon.subqueries and ("q_or", 1) in mon.subqueries


def test_duplicate_query_id_rejected():
    with pytest.raises(ValueError):
        Monitor([MonitorQuery("x", _T("a")), MonitorQuery("x", _T("b"))])


# ------------------------------------------------------- end-to-end matching


@pytest.fixture(scope="module")
def docs_df(spark, tiny_corpus_rows):
    rows = [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows[:60])]
    return spark.createDataFrame(rows, "doc_id: long, text: string").cache()


def _brute_matches(tiny_oracle, mon: Monitor, n_docs: int):
    """Ground truth: every registered PARENT query evaluated per doc."""
    out = set()
    for mq in mon.queries:
        hits = tiny_oracle.matches(mq.query)
        for d in hits:
            if d < n_docs:
                out.add((d, mq.query_id))
    return out


QUERY_SET = {
    "q_term": _T("merge"),
    "q_or": _B((_O.SHOULD, _T("hash")), (_O.SHOULD, _T("window"))),
    "q_and": _B((_O.MUST, _T("table")), (_O.MUST, _T("scan"))),
    "q_phrase": ir.PhraseQuery(("table", "scan")),
    "q_not": _B((_O.MUST, _T("scan")), (_O.MUST_NOT, _T("filter"))),
    "q_prefix": ir.PrefixQuery("sor"),
    "q_span": ir.SpanNearQuery(("table", "scan"), slop=2, in_order=True),
}


def test_presearch_is_sound_and_selective(spark, docs_df, tiny_oracle):
    mon = Monitor(QUERY_SET)
    cands = {
        (r.doc_id, r.query_id)
        for r in mon.presearch(docs_df).select("doc_id", "query_id").collect()
    }
    truth = _brute_matches(tiny_oracle, mon, 60)
    assert truth <= cands, "presearcher dropped a true match"
    # selectivity: candidates ≠ all pairs (ANYTOKEN queries aside)
    n_docs = docs_df.count()
    non_any = [k for k, q in QUERY_SET.items() if k != "q_prefix"]
    for qid in non_any:
        qc = {d for d, q in cands if q == qid}
        assert len(qc) < n_docs, f"{qid} candidates did not prune at all"
    # the ANYTOKEN query reaches every doc
    assert {d for d, q in cands if q == "q_prefix"} == set(range(60))


def test_match_equals_brute_force(spark, docs_df, tiny_oracle):
    mon = Monitor(QUERY_SET)
    got = {
        (r.doc_id, r.query_id)
        for r in mon.match(docs_df).collect()
    }
    assert got == _brute_matches(tiny_oracle, mon, 60)


def test_multipass_still_exact_but_prunes_more(spark, docs_df, tiny_oracle):
    mon1 = Monitor(QUERY_SET)
    mon2 = Monitor(QUERY_SET, passes=2)
    c1 = {
        (r.doc_id, r.query_id, r.sub_ord)
        for r in mon1.presearch(docs_df).collect()
    }
    c2 = {
        (r.doc_id, r.query_id, r.sub_ord)
        for r in mon2.presearch(docs_df).collect()
    }
    assert c2 <= c1, "extra passes must only narrow candidates"
    got = {(r.doc_id, r.query_id) for r in mon2.match(docs_df).collect()}
    assert got == _brute_matches(tiny_oracle, mon2, 60)


def test_scoring_mode_single_term(spark, docs_df, tiny_oracle):
    # per-doc index: N=1, df=1 → w = ln(1 + 0.5/1.5); declen = decoded
    # norm byte; avgdl = the doc's exact length
    from lucene_solr_spark.oracle import smallfloat
    from lucene_solr_spark.oracle.tokenizer import analyze

    mon = Monitor({"q": _T("merge")})
    got = {r.doc_id: r.score for r in mon.match(docs_df, mode="scoring").collect()}
    rows = docs_df.orderBy("doc_id").collect()
    expected = {}
    for r in rows:
        toks = [t.term for t in analyze(r.text)]
        tf = toks.count("merge")
        if tf == 0:
            continue
        dl = len(toks)
        declen = float(smallfloat.byte4_to_int(smallfloat.int_to_byte4(dl)))
        w = math.log(1.0 + 0.5 / 1.5)
        inv = 1.0 / (1.2 * (0.25 + 0.75 * declen / dl))
        expected[r.doc_id] = w - w / (1.0 + tf * inv)
    assert set(got) == set(expected)
    for d in got:
        assert got[d] == pytest.approx(expected[d], rel=1e-12)


def test_scoring_sums_decomposed_parts(spark, docs_df):
    # a doc matching BOTH disjuncts gets the sum of the two part scores
    # (ScoringMatch.resolve — ScoringMatch.java:42-45)
    or_q = _B((_O.SHOULD, _T("table")), (_O.SHOULD, _T("scan")))
    mon = Monitor({"q": or_q})
    mon_a = Monitor({"q": _T("table")})
    mon_b = Monitor({"q": _T("scan")})
    s = {r.doc_id: r.score for r in mon.match(docs_df, mode="scoring").collect()}
    sa = {r.doc_id: r.score for r in mon_a.match(docs_df, mode="scoring").collect()}
    sb = {r.doc_id: r.score for r in mon_b.match(docs_df, mode="scoring").collect()}
    for d, v in s.items():
        assert v == pytest.approx(sa.get(d, 0.0) + sb.get(d, 0.0), rel=1e-12)


def test_fuzz_presearch_soundness(spark, tiny_corpus_rows, tiny_oracle):
    """Random query set over the full tiny corpus: candidates ⊇ matches,
    match() == brute force (the monitor equivalent of the round-4
    0/4000-style studies)."""
    import random

    rng = random.Random(7)
    vocab = sorted(tiny_oracle.dictionary())
    qs: dict[str, ir.Query] = {}
    for i in range(30):
        kind = rng.randrange(5)
        pick = lambda: rng.choice(vocab)
        if kind == 0:
            qs[f"f{i}"] = _T(pick())
        elif kind == 1:
            qs[f"f{i}"] = _B((_O.SHOULD, _T(pick())), (_O.SHOULD, _T(pick())))
        elif kind == 2:
            qs[f"f{i}"] = _B((_O.MUST, _T(pick())), (_O.MUST, _T(pick())))
        elif kind == 3:
            qs[f"f{i}"] = _B((_O.MUST, _T(pick())), (_O.MUST_NOT, _T(pick())))
        else:
            qs[f"f{i}"] = ir.PhraseQuery((pick(), pick()))
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id: long, text: string",
    )
    mon = Monitor(qs)
    cands = {
        (r.doc_id, r.query_id)
        for r in mon.presearch(docs).select("doc_id", "query_id").collect()
    }
    got = {(r.doc_id, r.query_id) for r in mon.match(docs).collect()}
    truth = _brute_matches(tiny_oracle, mon, len(tiny_corpus_rows))
    assert truth <= cands
    assert got == truth


def test_scoring_mode_sloppy_phrase_not_dropped(spark, docs_df):
    """A slop-matched phrase must appear in scoring mode with the
    SloppyPhraseMatcher float freq — not score 0 and vanish (the exact
    matcher only counts slop=0 occurrences)."""
    q = ir.PhraseQuery(("kwargs", "env"), slop=2)
    mon = Monitor({"qp": q})
    match_docs = {r.doc_id for r in mon.match(docs_df).collect()}
    scored = {r.doc_id: r.score for r in mon.match(docs_df, mode="scoring").collect()}
    assert set(scored) == match_docs and match_docs
    assert all(s > 0.0 for s in scored.values())


def test_unsupported_analyzer_kwargs_fail_at_registration():
    with pytest.raises(ValueError, match="unsupported monitor analyzer"):
        Monitor({"q": _T("a")}, analyzer_kwargs={"synonyms": {"a": ("b",)}})


def test_highlights_mode(spark, docs_df, tiny_oracle):
    """HighlightsMatch: one row per hit span; term hits are the term's
    occurrences, phrase hits the alignments, parts of a decomposed
    query union (HighlightsMatch.java merge semantics)."""
    mon = Monitor(
        {
            "h_term": _T("merge"),
            "h_phrase": ir.PhraseQuery(("table", "scan")),
            "h_or": _B((_O.SHOULD, _T("hash")), (_O.SHOULD, _T("window"))),
        }
    )
    rows = mon.match(docs_df, mode="highlights").collect()
    got = {}
    for r in rows:
        got.setdefault((r.doc_id, r.query_id), set()).add(
            (r.start_pos, r.end_pos)
        )
    # spot-check against oracle positions
    for d in range(60):
        occ = tiny_oracle.positions.get("merge", {}).get(d)
        if occ:
            assert got[(d, "h_term")] == {(p, p + 1) for p in occ}, d
        else:
            assert (d, "h_term") not in got
    # phrase spans are width 2 and every hit aligns table→scan
    for (d, qid), spans in got.items():
        if qid != "h_phrase":
            continue
        tp = set(tiny_oracle.positions.get("table", {}).get(d, []))
        sp_ = set(tiny_oracle.positions.get("scan", {}).get(d, []))
        for s, e in spans:
            assert e == s + 2 and s in tp and (s + 1) in sp_
    # the OR decomposes: hits union the parts
    for d in range(60):
        want = set()
        for t in ("hash", "window"):
            want |= {(p, p + 1) for p in tiny_oracle.positions.get(t, {}).get(d, [])}
        if want:
            assert got[(d, "h_or")] == want, d
