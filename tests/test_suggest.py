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
