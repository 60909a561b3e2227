"""lucene/join module semantics: block joins + JoinUtil value join.

Reference behaviors pinned (join/src/java/org/apache/lucene/search/join/):
- ScoreMode.java:20-36 — None/Avg/Max/Total/Min child-score aggregation
- ToParentBlockJoinQuery.java:350-375 — child scores accumulate in
  double; Avg divides by matched-child freq
- ToChildBlockJoinQuery.java:150-170 — parent score handed to every child
- ParentChildrenBlockJoinQuery.java:35-55 — children of one parent
- JoinUtil.java:91-160 — per-join-value score agg, to-side constant per value
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.joins import (
    join_util,
    parent_children_block_join,
    to_child_block_join,
    to_parent_block_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    # 3 parent blocks; child scores chosen exactly representable in f32
    hits = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 4.0), (10, 3.0), (20, 0.5)],
        "doc_id long, score double",
    )
    docs = spark.createDataFrame(
        [(i, "pa", "en") for i in range(0, 5)]
        + [(i, "pb", "fr") for i in range(10, 13)]
        + [(i, "pc", "en") for i in range(20, 22)],
        "doc_id long, src string, lang string",
    )
    return hits, docs


def _by_parent(df):
    return {r["src"]: r for r in df.collect()}


def test_score_modes(frames):
    hits, docs = frames
    expect = {
        "avg": {"pa": (1.0 + 2.0 + 4.0) / 3, "pb": 3.0, "pc": 0.5},
        "max": {"pa": 4.0, "pb": 3.0, "pc": 0.5},
        "total": {"pa": 7.0, "pb": 3.0, "pc": 0.5},
        "min": {"pa": 1.0, "pb": 3.0, "pc": 0.5},
        "none": {"pa": 0.0, "pb": 0.0, "pc": 0.0},
    }
    for mode, want in expect.items():
        got = _by_parent(to_parent_block_join(hits, docs, "src", mode))
        assert {k: v["score"] for k, v in got.items()} == want, mode
    # matched-child freq (the reference's ParentApproximation freq)
    got = _by_parent(to_parent_block_join(hits, docs, "src", "avg"))
    assert {k: v["n_children"] for k, v in got.items()} == {
        "pa": 3,
        "pb": 1,
        "pc": 1,
    }


def test_unknown_mode_raises(frames):
    hits, docs = frames
    with pytest.raises(ValueError):
        to_parent_block_join(hits, docs, "src", "geometric").collect()


def test_to_child_propagates_parent_score(frames):
    hits, docs = frames
    parents = to_parent_block_join(hits, docs, "src", "max")
    kids = to_child_block_join(parents, docs, "src")
    rows = {r["doc_id"]: r["score"] for r in kids.collect()}
    # EVERY child of a matching parent matches, with the parent's score —
    # including children the child query itself missed (doc 3, 4, ...)
    assert len(rows) == 10
    for d in range(0, 5):
        assert rows[d] == 4.0
    for d in range(10, 13):
        assert rows[d] == 3.0
    for d in range(20, 22):
        assert rows[d] == 0.5


def test_to_child_unscored(frames):
    hits, docs = frames
    parents = to_parent_block_join(hits, docs, "src", "none").filter(
        F.col("src") != "pc"
    )
    kids = to_child_block_join(parents, docs, "src", score=False)
    assert sorted(r["doc_id"] for r in kids.collect()) == list(range(0, 5)) + list(
        range(10, 13)
    )


def test_parent_children_one_parent(frames):
    hits, docs = frames
    kids = parent_children_block_join(hits, docs, "src", "pa")
    rows = {r["doc_id"]: r["score"] for r in kids.collect()}
    # only pa's children, keeping the CHILD query scores
    assert rows == {0: 1.0, 1: 2.0, 2: 4.0}


def test_join_util_value_join(frames):
    hits, docs = frames
    out = join_util(hits, docs, "lang", docs, "lang", "max")
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    # en hits: docs 0,1,2 (max 4.0) + 20 (0.5) → max 4.0; fr: doc 10 → 3.0
    for d in [0, 1, 2, 3, 4, 20, 21]:
        assert rows[d] == 4.0
    for d in [10, 11, 12]:
        assert rows[d] == 3.0
    assert len(rows) == 10


def test_join_util_total_vs_manual(frames):
    hits, docs = frames
    out = join_util(hits, docs, "lang", docs, "lang", "total")
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    assert rows[0] == 1.0 + 2.0 + 4.0 + 0.5  # all en hit scores
    assert rows[10] == 3.0


def test_block_join_plans_are_scale_safe(frames):
    """to_child and join_util must broadcast the hit/value side — the
    corpus side stays a map-only scan (no shuffle of the big table)."""
    hits, docs = frames
    parents = to_parent_block_join(hits, docs, "src", "avg")
    plan = to_child_block_join(parents, docs, "src")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    plan2 = join_util(hits, docs, "lang", docs, "lang", "max")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan2
