"""Query-time joins — the roles of the ``lucene/join`` module
(``join/src/java/org/apache/lucene/search/join/``), re-expressed as
DataFrame plans.

Reference semantics:

- ``ToParentBlockJoinQuery.java:67-120``: children + their parent are
  indexed as ONE contiguous doc block; a parent bitset marks block ends;
  a child query's hits roll up to the parent with the child scores
  aggregated per ``ScoreMode.java:20-36`` (None/Avg/Max/Total/Min). The
  scorer accumulates child scores in DOUBLE and (for Avg) divides by the
  child freq once (``ToParentBlockJoinQuery.java:350-375``).
- ``ToChildBlockJoinQuery.java:35-60``: the reverse — a parent query's
  score is handed to every child in the block.
- ``ParentChildrenBlockJoinQuery.java:35-55``: the children of ONE given
  parent, scored by the child query.
- ``JoinUtil.java:91-160`` (createJoinQuery): a VALUE join — collect the
  join-field values of the from-side hits (with per-value score
  aggregation, ``TermsWithScoreCollector``), then match every to-side doc
  whose join field holds such a value, scored by the aggregate
  (``TermsIncludingScoreQuery``).

Spark mapping (NOT a port): Lucene's physical doc-block adjacency is an
artifact of its single-writer segment layout — the information content is
just a parent key per child. Here the block is a parent-key COLUMN, and
the rollup is a keyed aggregation:

- to-parent = ``hits ⋈ doc→parent`` then ``groupBy(parent).agg(mode)`` —
  one shuffle keyed by the parent, child hits only (not the corpus).
- to-child = ``children ⋈ broadcast(parent hits)`` — map-side, no
  shuffle: the parent hit list is query-sized, never corpus-sized.
- JoinUtil = ``groupBy(from_field)`` over the from-side hits (shuffle on
  the join value — bounded by the value cardinality, exactly the
  "float per unique join value" memory note at ``JoinUtil.java:77-79``)
  then a broadcast join against the to-side — the to-side is scanned
  once, map-only, which is the shape that survives a 100 TB to-side.

Score parity: child/leaf scores are cast to float32 BEFORE aggregation
(the reference's Scorer.score() IS a float), then summed in double —
float32 summands in double accumulation are exact at any realistic fan-in
(24-bit mantissas in a 53-bit accumulator), so Total/Avg are
order-independent and the CORRECTNESS oracles can reproduce them
bit-for-bit with ``sum(CAST(CAST(s AS REAL) AS DOUBLE))``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "to_parent_block_join",
    "to_child_block_join",
    "parent_children_block_join",
    "join_util",
    "SCORE_MODES",
]

SCORE_MODES = ("none", "avg", "max", "total", "min")


def _f32_exact(col: Column) -> Column:
    # float32 summand carried in a double accumulator → exact aggregation
    return col.cast("float").cast("double")


def _agg_score(score_mode: str) -> Column:
    """ScoreMode.java:20-36 aggregation over child scores."""
    s = _f32_exact(F.col("score"))
    if score_mode == "avg":
        # double sum of f32 summands (exact) ÷ count — ONE rounding,
        # mirroring BlockJoinScorer's double accumulator ÷ freq
        return F.sum(s) / F.count(F.lit(1))
    if score_mode == "max":
        return F.max(s)
    if score_mode == "total":
        return F.sum(s)
    if score_mode == "min":
        return F.min(s)
    if score_mode == "none":
        # ToParentBlockJoinQuery wraps the child query in a constant-score
        # when no scores are needed; the parent surfaces score 0
        return F.lit(0.0)
    raise ValueError(f"unknown score_mode {score_mode!r}; one of {SCORE_MODES}")


def to_parent_block_join(
    child_hits: DataFrame,
    docs: DataFrame,
    parent_col: str,
    score_mode: str = "avg",
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """``ToParentBlockJoinQuery``: roll child hits up to their parents.

    ``child_hits`` is a scored match frame ``(doc_id, score)`` (e.g.
    ``DFExecutor.matches(q)``); ``docs`` maps ``id_col`` → ``parent_col``.
    Returns ``(parent_col, score, n_children)`` — ``n_children`` is the
    matched-child freq the reference exposes through
    ``ParentApproximation``/explain.
    """
    keyed = child_hits.join(docs.select(id_col, parent_col), id_col)
    return keyed.groupBy(parent_col).agg(
        _agg_score(score_mode).alias("score"),
        F.count(F.lit(1)).alias("n_children"),
    )


def to_child_block_join(
    parent_hits: DataFrame,
    docs: DataFrame,
    parent_col: str,
    *,
    id_col: str = "doc_id",
    score: bool = True,
) -> DataFrame:
    """``ToChildBlockJoinQuery``: every child of a matching parent
    matches, carrying the parent's score (``doParentScore`` propagation,
    ``ToChildBlockJoinQuery.java:150-170``).

    ``parent_hits`` must have ``(parent_col, score)``. Map-only: the
    parent hit list is broadcast; the child corpus is scanned once.
    """
    cols = [parent_col, "score"] if score else [parent_col]
    hits = F.broadcast(parent_hits.select(*cols))
    out = docs.select(id_col, parent_col).join(hits, parent_col)
    if score:
        return out.select(id_col, F.col("score").cast("double").alias("score"))
    return out.select(id_col)


def parent_children_block_join(
    child_hits: DataFrame,
    docs: DataFrame,
    parent_col: str,
    parent_value,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """``ParentChildrenBlockJoinQuery``: the matching children of ONE
    parent, keeping their child-query scores (used to retrieve the child
    hits behind one parent hit of a ToParentBlockJoin search)."""
    ids = docs.filter(F.col(parent_col) == F.lit(parent_value)).select(id_col)
    return child_hits.join(F.broadcast(ids), id_col).select(id_col, "score")


def join_util(
    from_hits: DataFrame,
    from_docs: DataFrame,
    from_field: str,
    to_docs: DataFrame,
    to_field: str,
    score_mode: str = "max",
    *,
    from_id_col: str = "doc_id",
    to_id_col: str = "doc_id",
) -> DataFrame:
    """``JoinUtil.createJoinQuery``: value join from the from-side hits
    to every to-side doc sharing the join value.

    Phase 1 (``TermsWithScoreCollector``): join values of the from-side
    hits with per-value score aggregation — a groupBy on the join value.
    Phase 2 (``TermsIncludingScoreQuery``): to-side docs whose
    ``to_field`` is in the collected set score the per-value aggregate.
    The collected value table is broadcast — to-side scan stays map-only.
    """
    vals = (
        from_hits.join(from_docs.select(from_id_col, from_field), from_id_col)
        .groupBy(from_field)
        .agg(_agg_score(score_mode).alias("score"))
    )
    on = to_docs[to_field] == vals[from_field]
    return (
        to_docs.select(to_id_col, to_field)
        .join(F.broadcast(vals), on)
        .select(to_id_col, F.col("score").cast("double").alias("score"))
    )
