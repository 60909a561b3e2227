"""Range + hierarchical (taxonomy) facet counts — the roles of
``lucene/facet/src/java/org/apache/lucene/facet/range/`` and
``facet/taxonomy/TaxonomyFacetCounts.java``, re-expressed as single-scan
DataFrame aggregations.

Scale notes:
- ``range_facet_counts`` computes EVERY range in one scan with map-side
  conditional sums (ranges may overlap, exactly like
  ``LongRangeFacetCounts`` — a doc counts in each range containing it);
  no explode, no per-range scan, result is |ranges| rows.
- ``taxonomy_counts`` explodes each doc's path into its ancestor
  prefixes (the taxonomy ordinal hierarchy role: a doc increments every
  ancestor, ``TaxonomyFacetCounts.java:52-76``) then one groupBy — one
  shuffle keyed by path prefix; cardinality is the taxonomy size, not the
  corpus size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "FacetRange",
    "range_facet_counts",
    "taxonomy_counts",
    "drill_down",
    "drill_sideways",
]


@dataclass(frozen=True)
class FacetRange:
    """``facet/range/DoubleRange.java:32-74``: [min, max] with inclusive
    flags; label is the facet value shown."""

    label: str
    lo: float
    hi: float
    min_inclusive: bool = True
    max_inclusive: bool = False


def range_facet_counts(
    df: DataFrame, col: str, ranges: list[FacetRange]
) -> DataFrame:
    """→ (range, count) rows, one per requested range (even when 0 —
    ``RangeFacetCounts`` reports every requested range), ordered as
    requested. Overlapping ranges each count the doc."""
    c = F.col(col)
    aggs = []
    for i, r in enumerate(ranges):
        lo_ok = (c >= r.lo) if r.min_inclusive else (c > r.lo)
        hi_ok = (c <= r.hi) if r.max_inclusive else (c < r.hi)
        aggs.append(
            F.sum(F.when(lo_ok & hi_ok & c.isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_r{i}")
        )
    row = df.agg(*aggs)
    # one-row frame → |ranges| rows via stack (no second scan)
    stack = ", ".join(
        f"'{r.label}', _r{i}" for i, r in enumerate(ranges)
    )
    return row.selectExpr(
        f"stack({len(ranges)}, {stack}) AS (range, count)"
    )


def taxonomy_counts(
    df: DataFrame,
    components: list[str] | None = None,
    *,
    path_col: str | None = None,
    sep: str = "/",
    max_depth: int | None = None,
) -> DataFrame:
    """Hierarchical dimension counts → (path, depth, count).

    The dimension path comes either from ``components`` (a list of
    columns forming the taxonomy levels, like
    ``FacetField("dim", "lang", "source")``) or an existing
    ``sep``-joined ``path_col``. A doc increments its node AND every
    ancestor — ``FacetsConfig.setHierarchical`` semantics."""
    if (components is None) == (path_col is None):
        raise ValueError("exactly one of components / path_col")
    if components is not None:
        path = F.concat_ws(sep, *[F.col(c) for c in components])
    else:
        path = F.col(path_col)
    # ancestor prefixes: for a depth-d path emit the d prefixes of
    # length 1..d (capped at max_depth)
    n_levels = f"size(split(_path, '{sep}'))"
    if max_depth is not None:
        n_levels = f"least({n_levels}, {int(max_depth)})"
    prefixes = F.expr(
        f"transform(sequence(1, {n_levels}), "
        f"k -> array_join(slice(split(_path, '{sep}'), 1, k), '{sep}'))"
    )
    out = (
        df.select(path.alias("_path"))
        .where(F.col("_path").isNotNull() & (F.col("_path") != ""))
        .select(F.explode(prefixes).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("count"))
        .withColumn("depth", F.size(F.split(F.col("path"), sep)))
        .select("path", "depth", "count")
    )
    return out


def _dim_pred(dim: str, values) -> F.Column:
    """One drill-down dimension: values within a dim OR together
    (``DrillDownQuery.java:104-118`` — same-dim adds disjoin)."""
    vals = list(values) if not isinstance(values, str) else [values]
    return F.col(dim).isin(vals)


def drill_down(
    hits: DataFrame,
    docs: DataFrame,
    dims: dict,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """``DrillDownQuery`` (facet/DrillDownQuery.java:45-118): the base
    hits FILTERed by every drill-down dimension — base query MUST +
    per-dim FILTER clauses (``:73-74``; filters don't score).

    ``hits`` = a scored match frame (doc_id, score);
    ``dims`` = {dim_column: value | [values]} over ``docs``.
    """
    keyed = docs.select(id_col, *dims.keys())
    for dim, values in dims.items():
        keyed = keyed.filter(_dim_pred(dim, values))
    return hits.join(keyed.select(id_col), id_col)


def drill_sideways(
    hits: DataFrame,
    docs: DataFrame,
    dims: dict,
    *,
    id_col: str = "doc_id",
) -> dict:
    """``DrillSideways`` (facet/DrillSideways.java:40-60): for each
    drilled dimension, facet counts computed with every OTHER
    dimension's filter applied but NOT its own — so a dimension's
    sibling values stay visible after the user drills into it
    (the "near-miss" collector per drill-down dim).

    Returns {dim: DataFrame(value, count)}. One hits⋈dims join feeds
    all |dims| aggregations; each agg shuffles only its dim's value
    cardinality — the base hit set is scanned once per dim but never
    re-searched (matching the reference's single base-query execution
    with one FacetsCollector per dim, DrillSideways.java:60-63).
    """
    keyed = hits.select(id_col).join(docs.select(id_col, *dims.keys()), id_col)
    out = {}
    for dim in dims:
        others = [_dim_pred(d, v) for d, v in dims.items() if d != dim]
        near_miss = keyed
        for p in others:
            near_miss = near_miss.filter(p)
        out[dim] = (
            near_miss.groupBy(F.col(dim).alias("value"))
            .agg(F.count(F.lit(1)).alias("count"))
        )
    return out
