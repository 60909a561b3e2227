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
    "SpanNearClauseQuery",
    "SpanTermQuery",
    "SpanMultiTermWrapper",
    "SpanOrQuery",
    "SpanNotQuery",
    "SpanWithinQuery",
    "SpanContainingQuery",
    "SpanNotContainingQuery",
    "SpanNotWithinQuery",
    "SpanFirstQuery",
    "NGramPhraseQuery",
    "MultiPhraseQuery",
    "span_to_dict",
    "span_from_dict",
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
    "BlendedTermQuery",
    "TermRangeQuery",
    "MAX_CLAUSE_COUNT",
    "TooManyClauses",
]

#: search/IndexSearcher.java maxClauseCount default
MAX_CLAUSE_COUNT = 1024


class TooManyClauses(ValueError):
    """A scoring multi-term rewrite expanded past MAX_CLAUSE_COUNT
    (IndexSearcher.TooManyClauses; constant-score rewrites never
    materialize clauses and are exempt, like the reference)."""


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
    """``field=None`` targets the index's default field; a name targets
    that field's postings/norms/stats (the role of Lucene's
    ``Term(field, text)`` — ``index/Term.java:36``; per-field stats via
    ``index/FieldInfos.java``). Field-qualified leaves are routed by
    operators.multi_field.MultiFieldExecutor."""

    term: str
    field: str | None = None


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
    field: str | None = None

    def __post_init__(self):
        if self.positions is None:
            object.__setattr__(self, "positions", tuple(range(len(self.terms))))


@dataclass(frozen=True)
class NGramPhraseQuery(Query):
    """Phrase of CONSECUTIVE n-grams (``search/NGramPhraseQuery.java:30``):
    over an n-gram analyzed field, matching every n-th gram plus the last
    is equivalent to matching all of them — the rewrite keeps terms at
    positions 0, n, 2n, … and the final term (``:42-77``), cutting the
    number of postings streams ~n× with an identical match set. The
    rewriter lowers this to a positions-explicit PhraseQuery."""

    n: int
    terms: Tuple[str, ...]

    def __post_init__(self):
        if self.n < 1:
            raise ValueError(f"bad n-gram size {self.n}")


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
    field: str | None = None

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


@dataclass(frozen=True)
class SpanTermQuery(Query):
    """Leaf of the span algebra (``spans/SpanTermQuery.java:35``): each
    occurrence of ``term`` is a width-1 position span."""

    term: str


@dataclass(frozen=True)
class SpanMultiTermWrapper(Query):
    """A multi-term query (prefix/wildcard/regexp/fuzzy/range) lifted into
    the span algebra (``spans/SpanMultiTermQueryWrapper.java:54``):
    executors expand it against THEIR dictionary into the SpanOr of the
    matching terms (SCORING_SPAN_QUERY_REWRITE role —
    ``SpanMultiTermQueryWrapper.java:146-162``), capped at
    MAX_CLAUSE_COUNT. Enables \"foo* within 5 of bar\" shapes."""

    query: Query


@dataclass(frozen=True)
class SpanNearClauseQuery(Query):
    """Span-near over CLAUSE sub-spans (the reference SpanNearQuery takes
    SpanQuery clauses, ``spans/SpanNearQuery.java:42``): each clause is a
    SpanTermQuery, a SpanOrQuery of terms, or a SpanMultiTermWrapper; a
    clause's spans are the union of its terms' width-1 position spans.
    ``SpanNearQuery`` (terms-only) remains the common fast form."""

    clauses: Tuple[Query, ...]
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """Union of sub-spans (``spans/SpanOrQuery.java:39``)."""

    clauses: Tuple[Query, ...]


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """Spans of ``include`` not overlapping a span of ``exclude`` widened
    by ``pre``/``post`` (``spans/SpanNotQuery.java:42-60``)."""

    include: Query
    exclude: Query
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanWithinQuery(Query):
    """Spans of ``little`` enclosed by a span of ``big``
    (``spans/SpanWithinQuery.java:33``)."""

    big: Query
    little: Query


@dataclass(frozen=True)
class SpanContainingQuery(Query):
    """Spans of ``big`` that contain a span of ``little``
    (``spans/SpanContainingQuery.java:33``)."""

    big: Query
    little: Query


@dataclass(frozen=True)
class SpanNotContainingQuery(Query):
    """Spans of ``minuend`` that do NOT contain any span of
    ``subtrahend`` — the containment complement of SpanContainingQuery
    (``queries/intervals/Intervals.java`` ``notContaining`` /
    ``DifferenceIntervalsSource`` semantics: exclusion by CONTAINMENT,
    not by overlap as in SpanNotQuery)."""

    minuend: Query
    subtrahend: Query


@dataclass(frozen=True)
class SpanNotWithinQuery(Query):
    """Spans of ``little`` NOT enclosed by any span of ``big`` — the
    containment complement of SpanWithinQuery
    (``queries/intervals/Intervals.java`` ``notContainedBy``)."""

    big: Query
    little: Query


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """Spans of ``match`` that END within the first ``end`` positions of
    the field (``spans/SpanFirstQuery.java:34`` — a SpanPositionRange
    with start=0)."""

    match: Query
    end: int


def span_to_dict(q: "Query") -> dict:
    """JSON-able form of a span tree: compiled kernel plans are plain
    JSON trees (broadcast + dedup-keyed by a canonical dump), so the IR
    node can't ride along raw."""
    if isinstance(q, SpanTermQuery):
        return {"t": "term", "term": q.term}
    if isinstance(q, SpanNearQuery):
        return {
            "t": "near",
            "terms": list(q.terms),
            "slop": q.slop,
            "in_order": bool(q.in_order),
        }
    if isinstance(q, SpanOrQuery):
        return {"t": "or", "clauses": [span_to_dict(c) for c in q.clauses]}
    if isinstance(q, SpanNotQuery):
        return {
            "t": "not",
            "include": span_to_dict(q.include),
            "exclude": span_to_dict(q.exclude),
            "pre": q.pre,
            "post": q.post,
        }
    if isinstance(q, SpanWithinQuery):
        return {
            "t": "within",
            "big": span_to_dict(q.big),
            "little": span_to_dict(q.little),
        }
    if isinstance(q, SpanFirstQuery):
        return {"t": "first", "match": span_to_dict(q.match), "end": q.end}
    if isinstance(q, SpanContainingQuery):
        return {
            "t": "containing",
            "big": span_to_dict(q.big),
            "little": span_to_dict(q.little),
        }
    if isinstance(q, SpanNotContainingQuery):
        return {
            "t": "not_containing",
            "minuend": span_to_dict(q.minuend),
            "subtrahend": span_to_dict(q.subtrahend),
        }
    if isinstance(q, SpanNotWithinQuery):
        return {
            "t": "not_within",
            "big": span_to_dict(q.big),
            "little": span_to_dict(q.little),
        }
    raise TypeError(f"not a span query: {type(q).__name__}")


def span_from_dict(d: dict) -> "Query":
    t = d["t"]
    if t == "term":
        return SpanTermQuery(d["term"])
    if t == "near":
        return SpanNearQuery(tuple(d["terms"]), d["slop"], d["in_order"])
    if t == "or":
        return SpanOrQuery(tuple(span_from_dict(c) for c in d["clauses"]))
    if t == "not":
        return SpanNotQuery(
            span_from_dict(d["include"]),
            span_from_dict(d["exclude"]),
            d["pre"],
            d["post"],
        )
    if t == "within":
        return SpanWithinQuery(span_from_dict(d["big"]), span_from_dict(d["little"]))
    if t == "containing":
        return SpanContainingQuery(
            span_from_dict(d["big"]), span_from_dict(d["little"])
        )
    if t == "not_containing":
        return SpanNotContainingQuery(
            span_from_dict(d["minuend"]), span_from_dict(d["subtrahend"])
        )
    if t == "not_within":
        return SpanNotWithinQuery(
            span_from_dict(d["big"]), span_from_dict(d["little"])
        )
    if t == "first":
        return SpanFirstQuery(span_from_dict(d["match"]), d["end"])
    raise ValueError(f"unknown span node type: {t}")


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Terms scored as one pseudo-term: df = max(sub df), ttf = sum
    (search/SynonymQuery.java:514-545 collectionStatistics merge)."""

    terms: Tuple[str, ...]
    field: str | None = None


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
    field: str | None = None


# --- multi-term (dictionary-expansion) queries ------------------------------


@dataclass(frozen=True)
class PrefixQuery(Query):
    """``constant_score=False`` selects SCORING_BOOLEAN_REWRITE
    (``search/ScoringRewrite.java:67-74`` addClause → one SHOULD
    TermQuery per matching dictionary term, each scored with its OWN
    df; boost 1.0 for every term since only FuzzyTermsEnum sets a
    BoostAttribute). Capped at MAX_CLAUSE_COUNT — the reference throws
    IndexSearcher.TooManyClauses past it (``MultiTermQuery.java:40``)."""

    prefix: str
    field: str | None = None
    constant_score: bool = True
    #: None = SCORING_BOOLEAN_REWRITE (TooManyClauses past the cap);
    #: an int N = TOP_TERMS_SCORING_BOOLEAN_REWRITE(N): keep the N
    #: top-of-PQ terms — at the constant boost of non-fuzzy MTQs the
    #: ScoreTerm order (boost desc, then SMALLER term wins,
    #: ``TopTermsRewrite.java:210-213``) degenerates to the N
    #: lexicographically smallest matches.
    max_expansions: int | None = None

    def __post_init__(self):
        _check_max_expansions(self.max_expansions)


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # * = any run, ? = any single char
    field: str | None = None
    constant_score: bool = True  # False = SCORING_BOOLEAN_REWRITE
    max_expansions: int | None = None  # int = TOP_TERMS variant

    def __post_init__(self):
        _check_max_expansions(self.max_expansions)


@dataclass(frozen=True)
class RegexpQuery(Query):
    regexp: str
    field: str | None = None
    constant_score: bool = True  # False = SCORING_BOOLEAN_REWRITE
    max_expansions: int | None = None  # int = TOP_TERMS variant

    def __post_init__(self):
        _check_max_expansions(self.max_expansions)


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2
    prefix_length: int = 0
    #: False = reference default TopTermsBlendedFreqScoringRewrite
    #: (FuzzyQuery.java:34,100): expand to the top-``max_expansions``
    #: dictionary terms by (boost desc, term asc), blend df = max over the
    #: expansion (BlendedTermQuery.java), score each as a boosted TermQuery.
    #: True = CONSTANT_SCORE_REWRITE (match set only).
    constant_score: bool = True
    max_expansions: int = 50
    field: str | None = None

    def __post_init__(self):
        _check_max_expansions(self.max_expansions)


def _check_max_expansions(v) -> None:
    """TopTermsRewrite rejects size < 1 (``TopTermsRewrite.java:64`` via
    ``util/PriorityQueue`` ctor — IllegalArgumentException); mirror that
    at construction so cap<=0 can never silently yield MatchNoDocs."""
    if v is not None and int(v) < 1:
        raise ValueError(f"max_expansions must be >= 1, got {v!r}")


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """Pre-expanded blended-df scored disjunction — what the reference
    default FuzzyQuery rewrites INTO (``search/BlendedTermQuery.java``:
    df := max over the expansion :281-286, scored as a boolean of boosted
    TermQueries :138-149). Round 5: first-class IR so BOTH executors
    serve the scored-fuzzy rewrite (``SegmentSearcher._expand_scored``
    lowers FuzzyQuery(constant_score=False) to this node driver-side).

    ``edits[i]`` is the OSA edit distance of ``terms[i]`` from the
    original query term; the per-clause boost 1 − ed/min(|term|,
    ``query_len``) is re-derived at compile time in the executor's exact
    float chain (carrying floats would lose the f32 expression order)."""

    terms: Tuple[str, ...]
    edits: Tuple[int, ...]
    df_blend: int
    query_len: int

    def __post_init__(self):
        if len(self.terms) != len(self.edits):
            raise ValueError("terms and edits must align")
        if not self.terms:
            raise ValueError("empty BlendedTermQuery")


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    field: str | None = None


@dataclass(frozen=True)
class CoveringQuery(Query):
    """Configurable number of required matches per document
    (``sandbox/search/CoveringQuery.java:44-84``): a doc matches when at
    least ``minimumNumberMatch`` of the sub queries match it, where the
    minimum is a PER-DOCUMENT long (LongValuesSource).  Values < 1 act
    like 1; docs whose source value is NULL never match (:62-65).  The
    score is the sum of the matching clauses' scores (CoveringScorer).

    ``min_match_expr`` is a Spark-SQL expression over the docs frame —
    the LongValuesSource seam (e.g. a doc-values column name or
    ``"1 + doc_id % 3"``)."""

    queries: Tuple[Query, ...]
    min_match_expr: str

    def __post_init__(self):
        if len(self.queries) > MAX_CLAUSE_COUNT:
            raise TooManyClauses(
                f"too many clauses: {len(self.queries)} > {MAX_CLAUSE_COUNT}"
            )
