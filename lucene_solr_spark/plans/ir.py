"""Query IR — the role of Lucene's ``Query`` tree.

Mirrors the reference's query classes (semantics, not code):
``search/TermQuery.java:36``, ``search/BooleanQuery.java:40`` +
``search/BooleanClause.java:90-98`` (occurs), ``search/PhraseQuery.java:71``,
``search/SynonymQuery.java:52``, ``search/DisjunctionMaxQuery.java:45``,
``search/BoostQuery.java:30``, ``search/ConstantScoreQuery.java:29``,
``search/MatchAllDocsQuery.java:24``, ``search/MatchNoDocsQuery.java:23``,
``search/TermInSetQuery.java:74``, ``search/PrefixQuery.java:29``,
``search/WildcardQuery.java:38``, ``search/RegexpQuery.java:44``,
``search/FuzzyQuery.java:52``, ``search/TermRangeQuery.java:37``.

All queries are frozen dataclasses so rewrites are pure tree→tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Tuple

__all__ = [
    "Occur",
    "Query",
    "TermQuery",
    "BooleanClause",
    "BooleanQuery",
    "PhraseQuery",
    "SpanNearQuery",
    "SynonymQuery",
    "DisjunctionMaxQuery",
    "BoostQuery",
    "ConstantScoreQuery",
    "MatchAllDocsQuery",
    "MatchNoDocsQuery",
    "TermInSetQuery",
    "PrefixQuery",
    "WildcardQuery",
    "RegexpQuery",
    "FuzzyQuery",
    "TermRangeQuery",
    "MAX_CLAUSE_COUNT",
]

#: search/IndexSearcher.java maxClauseCount default
MAX_CLAUSE_COUNT = 1024


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    FILTER = "FILTER"  # MUST without scoring (BooleanClause.java:93)
    MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str


@dataclass(frozen=True)
class BooleanClause:
    occur: Occur
    query: Query


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: Tuple[BooleanClause, ...]
    min_should_match: int = 0

    def __post_init__(self):
        if len(self.clauses) > MAX_CLAUSE_COUNT:
            raise ValueError(f"too many clauses: {len(self.clauses)} > {MAX_CLAUSE_COUNT}")

    def by_occur(self, occur: Occur) -> tuple[Query, ...]:
        return tuple(c.query for c in self.clauses if c.occur == occur)


@dataclass(frozen=True)
class PhraseQuery(Query):
    terms: Tuple[str, ...]
    slop: int = 0
    #: explicit term positions (defaults to 0..n-1); supports holes from
    #: removed stopwords (PhraseQuery.Builder.add(term, position))
    positions: Tuple[int, ...] = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.positions is None:
            object.__setattr__(self, "positions", tuple(range(len(self.terms))))


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with term ALTERNATIVES per position
    (``search/MultiPhraseQuery.java:53``): slot i matches any of
    ``term_groups[i]``; scoring uses the summed idf of ALL terms
    (``MultiPhraseQuery.java:222-235`` getStats) and the per-slot postings
    union (``UnionPostingsEnum`` ``:420``). Positions are unioned as a SET
    per slot — identical to the reference unless index-time synonyms put
    two alternatives at one position (our analyzer cannot)."""

    term_groups: Tuple[Tuple[str, ...], ...]
    slop: int = 0
    positions: Tuple[int, ...] = field(default=None)  # type: ignore[assignment]

    def __post_init__(self):
        if self.positions is None:
            object.__setattr__(
                self, "positions", tuple(range(len(self.term_groups)))
            )

    @property
    def all_terms(self) -> Tuple[str, ...]:
        return tuple(t for g in self.term_groups for t in g)


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Proximity algebra over term sub-spans
    (``search/spans/SpanNearQuery.java:42``): matches docs where the
    clause terms occur within ``slop`` intervening positions, optionally
    in clause order. Scored like a phrase: summed-idf weight
    (``spans/SpanWeight.java``), float freq = Σ 1/(1+matchWidth)
    (``spans/SpanScorer.java`` sloppyFreq)."""

    terms: Tuple[str, ...]
    slop: int = 0
    in_order: bool = True

    def __post_init__(self):
        if not self.in_order and len(set(self.terms)) != len(self.terms):
            raise ValueError(
                "unordered span-near with repeated terms is not supported"
            )


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Terms scored as one pseudo-term: df = max(sub df), ttf = sum
    (search/SynonymQuery.java:514-545 collectionStatistics merge)."""

    terms: Tuple[str, ...]


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    queries: Tuple[Query, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    reason: str = ""


@dataclass(frozen=True)
class TermInSetQuery(Query):
    terms: Tuple[str, ...]


# --- multi-term (dictionary-expansion) queries ------------------------------


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # * = any run, ? = any single char


@dataclass(frozen=True)
class RegexpQuery(Query):
    regexp: str


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2
    prefix_length: int = 0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
