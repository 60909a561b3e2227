"""Span-tree rewrites: dictionary expansion of multi-term wrappers.

``spans/SpanMultiTermQueryWrapper.java:54`` lifts a multi-term query into
the span algebra; its default SCORING_SPAN_QUERY_REWRITE
(``:146-162``) expands the wrapped automaton against the index dictionary
into a SpanOrQuery of SpanTermQueries. The expansion is index-dependent,
so executors pass their own ``expand_terms`` callback (the DataFrame
executor pushes the term predicate into the term_stats parquet scan; the
single-node oracle scans its in-memory dictionary).
"""

from __future__ import annotations

from typing import Callable

from lucene_solr_spark.plans import ir

__all__ = ["expand_span_wrappers"]


def expand_span_wrappers(
    q: ir.Query, expand_terms: Callable[[ir.Query], list]
) -> ir.Query:
    """Replace every SpanMultiTermWrapper with the SpanOr of its
    dictionary expansion (term-sorted, capped at MAX_CLAUSE_COUNT — the
    SpanOrQuery the reference rewrite builds). An empty expansion becomes
    an empty SpanOr (matches nothing)."""

    def walk(node: ir.Query) -> ir.Query:
        if isinstance(node, ir.SpanMultiTermWrapper):
            terms = sorted(expand_terms(node.query))
            if len(terms) > ir.MAX_CLAUSE_COUNT:
                raise ValueError(
                    f"span multi-term expansion too large: {len(terms)} > "
                    f"{ir.MAX_CLAUSE_COUNT}"
                )
            return ir.SpanOrQuery(tuple(ir.SpanTermQuery(t) for t in terms))
        if isinstance(node, ir.SpanOrQuery):
            return ir.SpanOrQuery(tuple(walk(c) for c in node.clauses))
        if isinstance(node, ir.SpanNearClauseQuery):
            return ir.SpanNearClauseQuery(
                tuple(walk(c) for c in node.clauses), node.slop, node.in_order
            )
        if isinstance(node, ir.SpanNotQuery):
            return ir.SpanNotQuery(
                walk(node.include), walk(node.exclude), node.pre, node.post
            )
        if isinstance(node, ir.SpanWithinQuery):
            return ir.SpanWithinQuery(walk(node.big), walk(node.little))
        if isinstance(node, ir.SpanContainingQuery):
            return ir.SpanContainingQuery(walk(node.big), walk(node.little))
        if isinstance(node, ir.SpanNotContainingQuery):
            return ir.SpanNotContainingQuery(
                walk(node.minuend), walk(node.subtrahend)
            )
        if isinstance(node, ir.SpanNotWithinQuery):
            return ir.SpanNotWithinQuery(walk(node.big), walk(node.little))
        if isinstance(node, ir.SpanFirstQuery):
            return ir.SpanFirstQuery(walk(node.match), node.end)
        return node  # SpanTermQuery / SpanNearQuery leaves

    return walk(q)
