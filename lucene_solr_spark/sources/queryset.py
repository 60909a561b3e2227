"""Deterministic benchmark query-set generator.

Produces a luceneutil/wikimedium-style mix (the reference's benchmark
query-file pattern: ``benchmark/conf/query-terms.txt``,
``query-phrases.txt``, term / AND / OR / phrase lines) directly from the
index's own dictionary and a small sample of documents, so the set is
reproducible from the data alone — no external files.

Mix (wikimedium convention): single terms spanning df deciles (head,
mid, tail), 2-term conjunctions, 2-term disjunctions, exact phrases drawn
from real document bigrams (so phrase queries have non-trivial hit
counts)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from lucene_solr_spark.plans import ir

__all__ = ["generate_queryset"]


def generate_queryset(
    spark,
    term_stats_df,
    sample_texts: list[str],
    *,
    n_terms: int = 40,
    n_and: int = 30,
    n_or: int = 30,
    n_phrase: int = 20,
    min_df: int = 2,
) -> dict[str, ir.Query]:
    """→ {query_id: Query}. Deterministic given the same index + texts."""
    from lucene_solr_spark.oracle.tokenizer import analyze

    terms = [
        r["term"]
        for r in term_stats_df.filter(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("term"))
        .select("term")
        .collect()
    ]
    if not terms:
        return {}

    # df-decile coverage: evenly spaced picks across the df-sorted dict
    def spread(n: int, offset: int = 0) -> list[str]:
        if not terms:
            return []
        step = max(1, len(terms) // max(n, 1))
        return [terms[(offset + i * step) % len(terms)] for i in range(n)]

    out: dict[str, ir.Query] = {}
    for i, t in enumerate(spread(n_terms)):
        out[f"term_{i:03d}"] = ir.TermQuery(t)
    for i, (a, b) in enumerate(zip(spread(n_and, 1), spread(n_and, 7))):
        if a == b:
            continue
        out[f"and_{i:03d}"] = ir.BooleanQuery(
            (
                ir.BooleanClause(ir.Occur.MUST, ir.TermQuery(a)),
                ir.BooleanClause(ir.Occur.MUST, ir.TermQuery(b)),
            ),
            0,
        )
    for i, (a, b) in enumerate(zip(spread(n_or, 3), spread(n_or, 11))):
        if a == b:
            continue
        out[f"or_{i:03d}"] = ir.BooleanQuery(
            (
                ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery(a)),
                ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery(b)),
            ),
            0,
        )

    # phrases: most common bigrams in the sampled docs
    bigrams: Counter = Counter()
    for text in sample_texts:
        toks = [t.term for t in analyze(text)]
        bigrams.update(zip(toks, toks[1:]))
    common = [bg for bg, _ in bigrams.most_common(n_phrase * 3) if bg[0] != bg[1]]
    for i, bg in enumerate(common[:n_phrase]):
        out[f"phrase_{i:03d}"] = ir.PhraseQuery(bg)
    return out
