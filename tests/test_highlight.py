"""UnifiedHighlighter re-expression — pure-kernel tests (no Spark).

Parity contract: analyze_with_offsets must produce EXACTLY the oracle
analyzer's (term, pos) stream, plus spans that slice the original text
back out; passages follow the documented ±ctx merge rule.
"""

from __future__ import annotations

from lucene_solr_spark.functions.highlight import (
    analyze_with_offsets,
    best_passages,
    highlight_text,
)
from lucene_solr_spark.oracle.tokenizer import (
    ENGLISH_STOP_WORDS,
    analyze,
)

CASES = [
    "the quick brown fox jumps over the lazy dog",
    "obj.method2 calls foo_bar with x=3.14 and can't fail",
    "Merge  policy   chooses; segments, by TIER!",
    "",
    "trailing dot. and 3.14.15 numbers",
]


def test_offsets_match_oracle_stream():
    for text in CASES:
        expected = analyze(text)
        got = analyze_with_offsets(text)
        assert [(t, p) for t, p, _s, _e in got] == [tuple(t) for t in expected]
        # spans must slice the source to the RAW (pre-normalization) token
        for term, _pos, s, e in got:
            assert text[s:e].lower() == term


def test_offsets_match_oracle_stream_english_chain():
    kw = dict(
        stopwords=ENGLISH_STOP_WORDS, strip_possessive=True, stemmer="porter"
    )
    for text in CASES:
        expected = analyze(text, **kw)
        got = analyze_with_offsets(text, **kw)
        assert [(t, p) for t, p, _s, _e in got] == [tuple(t) for t in expected]


def test_split_candidate_subspans():
    # '.' between a letter and a digit is an invalid mid-char context ->
    # the candidate splits (StandardTokenizerImpl MidLetter rules); each
    # sub-token must carry its exact source span
    text = "call obj.2method now"
    got = analyze_with_offsets(text)
    assert [(t, p) for t, p, _s, _e in got] == [
        (t, p) for t, p in analyze(text)
    ]
    terms = {t: (s, e) for t, _p, s, e in got}
    assert text[slice(*terms["obj"])] == "obj"
    assert text[slice(*terms["2method"])] == "2method"


def test_best_passage_basic_markup():
    text = "a b c merge d e f g h merge i"
    ps = best_passages(text, {"merge"}, ctx=2, top_n=5)
    # both matches ±2 tokens: windows [1..5] and [7..11] -> no overlap
    assert len(ps) == 2
    assert ps[0].n_matches == 1 and ps[1].n_matches == 1
    assert "<b>merge</b>" in ps[0].snippet
    # original-slice mode preserves the source characters between tokens
    assert ps[0].snippet == "b c <b>merge</b> d e"


def test_passage_windows_merge_and_rank():
    text = "x merge y merge z a b c d e f g merge h"
    ps = best_passages(text, {"merge"}, ctx=1, top_n=2)
    # first two matches are ±1-adjacent -> merged into one 2-hit passage
    assert ps[0].n_matches == 2 and ps[0].score == 2.0
    assert ps[0].snippet == "x <b>merge</b> y <b>merge</b> z"
    assert ps[1].n_matches == 1


def test_weighted_scoring_prefers_rare_term():
    text = "common a b c d e f g h i j rare common"
    ps = best_passages(
        text, {"common": 0.1, "rare": 5.0}, ctx=1, top_n=1
    )
    assert "rare" in ps[0].snippet and ps[0].score >= 5.0


def test_join_tokens_mode_is_space_joined():
    text = "Merge  policy   window"
    ps = best_passages(text, {"merge"}, ctx=3, top_n=1, join_tokens=True)
    assert ps[0].snippet == "<b>Merge</b> policy window"


def test_stopword_positions_keep_gaps():
    text = "the merge of the window"
    kw = dict(stopwords=ENGLISH_STOP_WORDS)
    got = analyze_with_offsets(text, **kw)
    assert [(t, p) for t, p, _s, _e in got] == [("merge", 1), ("window", 4)]


def test_no_match_returns_none():
    assert highlight_text("nothing here", {"absent"}) is None


def test_highlight_hits_distributed(spark):
    """Spark path: broadcast-joined hit narrowing + map-only passage
    extraction equals the driver-side kernel run per doc."""
    from lucene_solr_spark.functions.highlight import best_passages, highlight_hits

    rows = [
        (0, "alpha merge beta gamma"),
        (1, "no hits here at all"),
        (2, "x merge y merge z tail words continue"),
        (3, "merge"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hits = spark.createDataFrame([(0,), (2,), (3,)], "doc_id long")
    got = {
        r["doc_id"]: (r["snippet"], r["passage_score"], r["n_matches"])
        for r in highlight_hits(hits, docs, {"merge": 2.5}, ctx=2).collect()
    }
    assert set(got) == {0, 2, 3}  # doc 1 not in hits; no silent extras
    for did, text in rows:
        if did not in got:
            continue
        p = best_passages(text, {"merge": 2.5}, ctx=2, top_n=1)[0]
        assert got[did] == (p.snippet, p.score, p.n_matches)
    assert got[0][0] == "alpha <b>merge</b> beta gamma"


def test_offset_source_equals_reanalysis(spark):
    """Stored-offsets highlighter (index_options='offsets',
    IndexOptions.java:50) must produce IDENTICAL output to the
    re-analysis path — same passage rule, different offset source
    (UnifiedHighlighter.java:1000-1032)."""
    from lucene_solr_spark.functions.highlight import (
        highlight_hits,
        highlight_hits_from_index,
    )
    from lucene_solr_spark.operators.index_build import build_index

    rows = [
        (0, "alpha merge beta gamma"),
        (1, "no hits here at all"),
        (2, "x merge y merge z tail words continue"),
        (3, "merge"),
        (4, "unicode café merge déjà \U0001f600 tail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hits = spark.createDataFrame([(0,), (2,), (3,), (4,)], "doc_id long")
    q = {"merge": 2.5}
    ix = build_index(
        docs, text_col="text", doc_id_col="doc_id", index_options="offsets"
    )
    key = lambda r: r["doc_id"]
    got = sorted(
        highlight_hits_from_index(ix, hits, docs, q, ctx=2).collect(), key=key
    )
    want = sorted(highlight_hits(hits, docs, q, ctx=2).collect(), key=key)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 4


# ------------------- sentence break mode (round 4, BreakIterator role)
def test_sentence_spans_segmentation():
    from lucene_solr_spark.functions.highlight import sentence_spans

    text = "The fox runs. The dog sleeps!  No terminator tail"
    spans = sentence_spans(text)
    assert [text[s:e] for s, e in spans] == [
        "The fox runs.",
        "The dog sleeps!",
        "No terminator tail",
    ]
    assert sentence_spans("") == []
    assert sentence_spans("...") == [(0, 3)]
    assert sentence_spans("one two") == [(0, 7)]


def test_sentence_passages_whole_sentence_emitted():
    text = "The fox runs fast. A slow dog naps. The fox naps too."
    ps = best_passages(text, {"fox"}, break_mode="sentence", top_n=5)
    assert [p.snippet for p in ps] == [
        "The <b>fox</b> runs fast.",
        "The <b>fox</b> naps too.",
    ]
    assert all(p.n_matches == 1 for p in ps)


def test_sentence_passages_rank_by_matches_then_start():
    text = "fox here. fox and fox again. nothing. fox last."
    ps = best_passages(text, {"fox"}, break_mode="sentence", top_n=3)
    assert ps[0].snippet == "<b>fox</b> and <b>fox</b> again."
    assert ps[0].n_matches == 2
    assert [p.snippet for p in ps[1:]] == ["<b>fox</b> here.", "<b>fox</b> last."]


def test_sentence_join_tokens_mode():
    text = "The fox runs fast. A slow dog naps."
    ps = best_passages(
        text, {"fox"}, break_mode="sentence", join_tokens=True, top_n=1
    )
    assert ps[0].snippet == "The <b>fox</b> runs fast"


def test_sentence_mode_no_match_returns_empty():
    assert best_passages("a b. c d.", {"zzz"}, break_mode="sentence") == []


def test_bad_break_mode_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="break_mode"):
        best_passages("a b", {"a"}, break_mode="paragraph")
