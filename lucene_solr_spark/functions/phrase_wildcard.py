"""PhraseWildcardQuery (``sandbox/search/PhraseWildcardQuery.java``) —
a phrase where any slot may be a multi-term (prefix / wildcard / regexp
/ range / fuzzy match-set) sub query.

The reference expands each multi-term slot against the segment's term
dictionary under a shared expansion budget and then runs the phrase
with per-slot postings unions (:66-118 class doc, segment-based
optimization).  Here the expansion happens ONCE against the global
dictionary frame (one pruned ``term_stats`` scan per wildcard slot)
and the result lowers to the engine's MultiPhraseQuery — the same
per-slot-union matcher and summed-idf scoring the reference's
MultiPhraseQuery family uses — so both executors and the SQL oracle
serve it unchanged.
"""

from __future__ import annotations

from ..plans import ir

__all__ = ["phrase_wildcard_query"]


def phrase_wildcard_query(
    index,
    slots,
    *,
    slop: int = 0,
    max_expansions: int = ir.MAX_CLAUSE_COUNT,
) -> ir.Query:
    """Build the lowered query.  ``slots`` items are literal term
    strings or multi-term IR leaves (PrefixQuery / WildcardQuery /
    RegexpQuery / TermRangeQuery / FuzzyQuery).  A slot expanding past
    ``max_expansions`` raises TooManyClauses (the reference's
    ``maxMultiTermExpansions`` budget, PhraseWildcardQuery.java:75-83);
    a slot with no dictionary match yields MatchNoDocs (an empty
    required position can never match)."""
    from ..plans.df_executor import multiterm_cond

    if max_expansions < 1:
        raise ValueError(f"max_expansions must be >= 1, got {max_expansions}")
    groups: list[tuple[str, ...]] = []
    for slot in slots:
        if isinstance(slot, str):
            groups.append((slot,))
            continue
        rows = (
            index.term_stats.filter(multiterm_cond(slot))
            .select("term")
            .limit(int(max_expansions) + 1)
            .collect()
        )
        if len(rows) > max_expansions:
            raise ir.TooManyClauses(
                f"wildcard slot expanded past {max_expansions} terms"
            )
        if not rows:
            return ir.MatchNoDocsQuery("wildcard slot matched no terms")
        groups.append(tuple(sorted(r.term for r in rows)))
    return ir.MultiPhraseQuery(tuple(groups), slop=slop)
