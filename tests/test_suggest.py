"""Suggest/spellcheck tests — DirectSpellChecker + completion roles."""

from __future__ import annotations

import pytest

from lucene_solr_spark.functions.suggest import prefix_suggest, spell_suggest
from lucene_solr_spark.operators.index_build import build_index
from lucene_solr_spark.sources.corpus import corpus_to_spark


@pytest.fixture(scope="module")
def ix(spark):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    return build_index(corpus).persist()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_spell_suggest_matches_reference_ranking(spark, ix):
    """Engine result == brute-force (distance, -df, term) ranking over
    the full dictionary with the same pruning rules."""
    word, max_edits, k = "mergee", 2, 5  # "merge" at distance 1
    got = [
        (r["term"], r["df"], r["distance"])
        for r in spell_suggest(ix.term_stats, word, max_edits=max_edits, k=k).collect()
    ]
    stats = {
        r["term"]: r["df"] for r in ix.term_stats.select("term", "df").collect()
    }
    cands = [
        (t, df, _lev(t, word))
        for t, df in stats.items()
        if t.startswith(word[0])
        and abs(len(t) - len(word)) <= max_edits
        and t != word
        and _lev(t, word) <= max_edits
    ]
    cands.sort(key=lambda x: (x[2], -x[1], x[0]))
    assert got == cands[:k]
    assert got and got[0][0] == "merge" and got[0][2] == 1


def test_spell_suggest_excludes_exact_and_caps_distance(spark, ix):
    rows = spell_suggest(ix.term_stats, "merge", max_edits=1, k=10).collect()
    assert all(r["term"] != "merge" and r["distance"] <= 1 for r in rows)


def test_prefix_suggest_completion(spark, ix):
    rows = prefix_suggest(ix.term_stats, "se", k=10).collect()
    assert rows, "corpus has se* terms (segment, select, ...)"
    assert all(r["term"].startswith("se") for r in rows)
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    # deterministic tie-break: term asc within equal df
    for a, b in zip(rows, rows[1:]):
        if a["df"] == b["df"]:
            assert a["term"] < b["term"]


def test_spell_suggest_empty_word_raises(spark, ix):
    with pytest.raises(ValueError):
        spell_suggest(ix.term_stats, "")


# --------------------------------------------------------- fuzzy_suggest


def synth_stats(spark):
    return spark.createDataFrame(
        [
            ("merge", 50),
            ("merges", 30),
            ("merged", 40),
            ("margin", 45),
            ("apply", 60),
            ("me", 5),
        ],
        "term string, df long",
    )


def test_fuzzy_suggest_prefix_within_edits(spark):
    from lucene_solr_spark.functions.suggest import fuzzy_suggest

    rows = fuzzy_suggest(synth_stats(spark), "mergo", max_edits=1, k=10).collect()
    got = [(r["term"], r["distance"]) for r in rows]
    # every merg* completion has a prefix at distance 1; margin needs 2
    # edits, apply fails the non-fuzzy first char, me fails length band
    assert got == [("merge", 1), ("merged", 1), ("merges", 1)]
    # weight-ranked: df desc (50, 40, 30)
    assert [r["df"] for r in rows] == [50, 40, 30]


def test_fuzzy_suggest_brute_force_parity(spark, ix):
    """Engine result == brute-force min-over-prefix-lengths Levenshtein
    on the real dictionary."""
    from lucene_solr_spark.functions.suggest import fuzzy_suggest

    q, e = "stram", 1  # typo of "stream"
    rows = fuzzy_suggest(ix.term_stats, q, max_edits=e, k=10).collect()
    got = [(r["term"], r["df"], r["distance"]) for r in rows]
    stats = {r["term"]: r["df"] for r in ix.term_stats.select("term", "df").collect()}
    cands = []
    for t, df in stats.items():
        if not t.startswith(q[0]) or len(t) < len(q) - e:
            continue
        d = min(
            _lev(t[:n], q)
            for n in range(len(q) - e, len(q) + e + 1)
            if n > 0
        )
        if d <= e:
            cands.append((t, df, d))
    cands.sort(key=lambda x: (-x[1], x[2], x[0]))
    assert got == cands[:10]
    assert any(t == "stream" for t, _, _ in got)


def test_fuzzy_suggest_short_query_falls_back_to_prefix(spark):
    from lucene_solr_spark.functions.suggest import fuzzy_suggest

    rows = fuzzy_suggest(synth_stats(spark), "me", max_edits=1, k=10).collect()
    # len < min_fuzzy_length: exact-prefix completion only, distance 0
    assert all(r["term"].startswith("me") and r["distance"] == 0 for r in rows)
    assert {r["term"] for r in rows} == {"me", "merge", "merges", "merged"}
