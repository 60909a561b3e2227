"""Deterministic benchmark query-set generator.

Produces a luceneutil/wikimedium-style mix (the reference's benchmark
query-file pattern: ``benchmark/conf/query-terms.txt``,
``query-phrases.txt``, term / AND / OR / phrase lines) directly from the
index's own dictionary and a small sample of documents, so the set is
reproducible from the data alone — no external files.

Mix (wikimedium convention): single terms spanning df deciles (head,
mid, tail), 2-term conjunctions, 2-term disjunctions, exact phrases drawn
from real document bigrams (so phrase queries have non-trivial hit
counts). Round 5 adds the heavy-rewrite classes the wikimedium task file
also carries (Prefix3/Fuzzy1/Fuzzy2/SloppyPhrase lines): scored prefix
(TOP_TERMS rewrite), scored fuzzy (blended-df OSA rewrite), and sloppy
phrases — so scaling legs exercise the dictionary-expansion and
position-matcher paths, not just term/AND/OR."""

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
    n_prefix: int = 0,
    n_fuzzy: int = 0,
    n_sloppy: int = 0,
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

    # scored prefix (wikimedium Prefix3): 3-char prefixes of df-spread
    # terms, TOP_TERMS(50) rewrite so the clause count is bounded on any
    # dictionary (TopTermsRewrite PQ contract)
    seen_p: set[str] = set()
    for t in spread(n_prefix * 3, 5):
        p = t[:3]
        if len(p) < 3 or p in seen_p:
            continue
        seen_p.add(p)
        out[f"prefix_{len(seen_p) - 1:03d}"] = ir.PrefixQuery(
            p, constant_score=False, max_expansions=50
        )
        if len(seen_p) >= n_prefix:
            break

    # fuzzy (wikimedium Fuzzy1/Fuzzy2): constant-score form — the
    # per-segment OSA dictionary intersection (Myers batch + borderline
    # OSA refinement) runs distributed inside every task, which is the
    # path a scaling leg must exercise; the scored blended-df rewrite is
    # the DF executor's (it cannot ride plain term clauses in the kernel
    # plan). Alternate max_edits 1/2 over length-5+ terms.
    fz = [t for t in spread(n_fuzzy * 3, 9) if len(t) >= 5]
    for i, t in enumerate(fz[:n_fuzzy]):
        out[f"fuzzy_{i:03d}"] = ir.FuzzyQuery(t, max_edits=1 + (i % 2))

    # sloppy phrases (wikimedium SloppyPhrase): the same real bigrams at
    # slop 2 — exercises the greedy matcher kernel per candidate doc
    for i, bg in enumerate(common[n_phrase : n_phrase + n_sloppy]):
        out[f"sloppy_{i:03d}"] = ir.PhraseQuery(bg, slop=2)
    return out
