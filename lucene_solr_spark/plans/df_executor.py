"""Relational (pure-DataFrame) query executor.

The role of Lucene's Weight/Scorer tree (``search/Weight.java:135-180``,
``search/Boolean2ScorerSupplier.java:109-247``) expressed as Catalyst
operators — Lucene's Boolean retrieval IS relational algebra over posting
lists (SURVEY.md §2.3):

  TermQuery     → partition-pruned filter on postings + norm join + score
  AND           → multi-way inner join on doc_id, Σ(double)→f32
  OR            → union + groupBy(doc_id).sum, Σ(double)→f32
  MUST_NOT      → left_anti join
  FILTER        → left_semi join (no score contribution)
  REQ+OPT       → left join, float add (ReqOptSumScorer.java:260-277)
  dismax        → groupBy max/sum combine (DisjunctionMaxScorer.java:60-74)
  phrase        → positions-array join + vectorized offset intersection
  multi-term    → dictionary scan (term_stats) → TermInSet constant-score
  top-k         → ORDER BY score DESC, doc_id ASC LIMIT k
                  (HitQueue.java:78-84 tie-break)

Two scoring modes:
  "float32" — Lucene-exact float32 BM25 via an Arrow UDF kernel (the
    rank-identity mode, tested bit-for-bit against oracle.engine).
  "double"  — same formulas in pure double built-in expressions (no UDF,
    whole-stage codegen) — the mode mirrored 1:1 by ANSI-SQL oracles in
    __spark_entry__.oracle_sql for the DuckDB correctness gate.

Note on accumulation order: Lucene double-sums sub-scores in heap order,
which is doc-dependent and unspecified; the f32 cast absorbs permutation
differences. We therefore let Spark's SUM aggregate in any order — same
contract as the reference.

Scale: term filters prune parquet row groups (postings written term-range
sorted); norms join broadcasts when small; the many-term OR unions first
and joins norms ONCE. The block-kernel executor (operators.topk) is the
high-throughput path; this executor is the always-correct fallback.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_solr_spark.operators.index_build import InvertedIndex
from lucene_solr_spark.oracle import bm25
from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.rewriter import rewrite

__all__ = ["DFExecutor", "multiterm_cond", "wildcard_to_regex"]


def _f32(x) -> np.float32:
    return np.float32(x)


_MULTITERM_TYPES = (
    ir.PrefixQuery,
    ir.WildcardQuery,
    ir.RegexpQuery,
    ir.TermRangeQuery,
    ir.FuzzyQuery,
)

_SPAN_TYPES = (
    ir.SpanTermQuery,
    ir.SpanNearQuery,
    ir.SpanNearClauseQuery,
    ir.SpanMultiTermWrapper,
    ir.SpanOrQuery,
    ir.SpanNotQuery,
    ir.SpanWithinQuery,
    ir.SpanContainingQuery,
    ir.SpanNotContainingQuery,
    ir.SpanNotWithinQuery,
    ir.SpanFirstQuery,
)


def _dedup_keep_order(*seqs) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for seq in seqs:
        for t in seq:
            if t not in seen:
                seen.add(t)
                out.append(t)
    return out


def span_term_sets(q: ir.Query) -> tuple[list[str], list[str], list[str]]:
    """(all, positive, required) leaf terms of a span tree, first-seen
    order. ``positive`` = scoring-side terms (everything not under a
    SpanNot exclude — SpanWeight term extraction); ``required`` = terms
    present in every possible match (safe to inner-join)."""
    if isinstance(q, ir.SpanTermQuery):
        s = [q.term]
        return s, list(s), list(s)
    if isinstance(q, ir.SpanMultiTermWrapper):
        # index-dependent: terms unknown until the executor expands it
        return [], [], []
    if isinstance(q, ir.SpanNearClauseQuery):
        alls, poss, reqs = [], [], []
        for c in q.clauses:
            a, p, r = span_term_sets(c)
            alls.append(a)
            poss.append(p)
            reqs.append(r)  # every clause must match → its required terms
        return (
            _dedup_keep_order(*alls),
            _dedup_keep_order(*poss),
            _dedup_keep_order(*reqs),
        )
    if isinstance(q, ir.SpanNearQuery):
        s = _dedup_keep_order(q.terms)
        return s, list(s), list(s)
    if isinstance(q, ir.SpanOrQuery):
        alls: list[list[str]] = []
        poss: list[list[str]] = []
        req: set[str] | None = None
        for c in q.clauses:
            a, p, r = span_term_sets(c)
            alls.append(a)
            poss.append(p)
            req = set(r) if req is None else (req & set(r))
        all_l = _dedup_keep_order(*alls)
        pos_l = _dedup_keep_order(*poss)
        return all_l, pos_l, [t for t in all_l if t in (req or set())]
    if isinstance(q, ir.SpanNotQuery):
        a1, p1, r1 = span_term_sets(q.include)
        a2, _, _ = span_term_sets(q.exclude)
        return _dedup_keep_order(a1, a2), p1, r1
    if isinstance(q, ir.SpanNotContainingQuery):
        # like SpanNot: subtrahend terms are evaluation-side only
        a1, p1, r1 = span_term_sets(q.minuend)
        a2, _, _ = span_term_sets(q.subtrahend)
        return _dedup_keep_order(a1, a2), p1, r1
    if isinstance(q, ir.SpanNotWithinQuery):
        a1, p1, r1 = span_term_sets(q.little)
        a2, _, _ = span_term_sets(q.big)
        return _dedup_keep_order(a1, a2), p1, r1
    if isinstance(q, ir.SpanFirstQuery):
        return span_term_sets(q.match)
    if isinstance(q, (ir.SpanWithinQuery, ir.SpanContainingQuery)):
        a1, p1, r1 = span_term_sets(q.big)
        a2, p2, r2 = span_term_sets(q.little)
        return (
            _dedup_keep_order(a1, a2),
            _dedup_keep_order(p1, p2),
            _dedup_keep_order(r1, r2),
        )
    raise TypeError(f"not a span query: {type(q).__name__}")


def wildcard_to_regex(pattern: str) -> str:
    import re as _re

    return "".join(
        ".*" if c == "*" else "." if c == "?" else _re.escape(c) for c in pattern
    )


def multiterm_cond(q: ir.Query) -> Column:
    """Multi-term query → Catalyst predicate on the ``term`` column (the
    automaton side of AutomatonQuery.java:45, as a pushdown-able filter)."""
    if isinstance(q, ir.PrefixQuery):
        return F.col("term").startswith(q.prefix)
    if isinstance(q, ir.WildcardQuery):
        return F.col("term").rlike(f"^(?:{wildcard_to_regex(q.pattern)})$")
    if isinstance(q, ir.RegexpQuery):
        return F.col("term").rlike(f"^(?:{q.regexp})$")
    if isinstance(q, ir.TermRangeQuery):
        cond = F.lit(True)
        if q.lower is not None:
            cond = cond & (
                F.col("term") >= q.lower if q.include_lower else F.col("term") > q.lower
            )
        if q.upper is not None:
            cond = cond & (
                F.col("term") <= q.upper if q.include_upper else F.col("term") < q.upper
            )
        return cond
    if isinstance(q, ir.FuzzyQuery):
        # exactness-preserving prefilters BEFORE the edit-distance, in
        # evaluation order (the automaton's pruning role,
        # FuzzyTermsEnum.java): |len(term)−len(q)| ≤ maxEdits is an OSA
        # lower bound and a cheap codegen comparison; the shared-prefix
        # predicate additionally prunes parquet row groups on the
        # term-sorted dictionary
        cond = F.length("term").between(
            len(q.term) - q.max_edits, len(q.term) + q.max_edits
        ) & _osa_leq_cond(q.term, int(q.max_edits))
        if q.prefix_length:
            cond = F.col("term").startswith(q.term[: q.prefix_length]) & cond
        return cond
    raise TypeError(f"not a multi-term query: {type(q).__name__}")


def _osa_leq_cond(qterm: str, max_edits: int) -> Column:
    """OSA distance (restricted Damerau — adjacent transposition = ONE
    edit, the reference FuzzyQuery default ``transpositions=true``,
    ``search/FuzzyQuery.java:46-48``) ≤ max_edits as a Catalyst predicate,
    layered so the JVM-side codegen'd levenshtein does almost all the
    work: lev ≤ k accepts outright (transpositions only lower the
    distance), OSA ≤ k forces lev ≤ 2k (one transposition = two
    substitutions), so the Arrow-batched Python OSA kernel only sees the
    borderline lev ∈ (k, 2k] band — a handful of terms even on a huge
    dictionary."""
    lev = F.levenshtein(F.col("term"), F.lit(qterm))

    @F.pandas_udf(T.BooleanType())
    def osa_ok(terms: pd.Series) -> pd.Series:
        from lucene_solr_spark.oracle.editdist import osa_batch

        return pd.Series(
            osa_batch(terms.tolist(), qterm, max_edits) <= max_edits,
            index=terms.index,
        )

    return (lev <= max_edits) | ((lev <= 2 * max_edits) & osa_ok(F.col("term")))


def rescore_combine(
    first_pass: DataFrame,
    second: DataFrame,
    *,
    weight: float,
    k: int,
    mode: str = "float32",
) -> DataFrame:
    """Shared QueryRescorer combine (``search/QueryRescorer.java:184-188``):
    ``first + weight * second`` where the second pass matched, first-pass
    score alone where it didn't. ``first_pass`` is a small (doc_id, score)
    frame, ``second`` a (doc_id, s2) match frame; the first pass is
    broadcast onto the distributed second pass.

    float32 mode mirrors the reference static helper exactly: the weight
    stays a double, the accumulate runs in double, and ONE final rounding
    to float happens at the end — not per-operation."""
    joined = F.broadcast(
        first_pass.withColumnRenamed("score", "s1")
    ).join(second, "doc_id", "left")
    comb = F.col("s1").cast("double") + F.lit(float(weight)) * F.coalesce(
        F.col("s2"), F.lit(0.0)
    ).cast("double")
    if mode == "float32":
        comb = comb.cast("float")
    return (
        joined.select("doc_id", comb.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


@dataclass
class DFExecutor:
    index: InvertedIndex
    k1: float = bm25.K1_DEFAULT
    b: float = bm25.B_DEFAULT
    mode: str = "float32"  # or "double"
    broadcast_norms_threshold: int = 5_000_000
    #: non-BM25 pluggable similarity (functions.similarities.Similarity);
    #: None = the built-in Lucene-parity BM25 fast paths
    similarity: object | None = None
    #: optional plans.query_cache.LRUQueryCache: FILTER / MUST_NOT
    #: clauses (filter context, search/LRUQueryCache.java:85) are served
    #: from pinned match-sets when the caching policy admits them
    query_cache: object | None = None
    _stats_cache: dict = field(default_factory=dict)

    # ------------------------------------------------------------------ api
    def topk(
        self,
        q: ir.Query,
        k: int = 10,
        after: tuple[float, int] | None = None,
    ) -> DataFrame:
        """Top-k by (score desc, doc_id asc). ``after=(score, doc_id)``
        resumes strictly past that cursor (IndexSearcher.searchAfter,
        search/IndexSearcher.java:470): the tie-break makes the sort order
        total, so the cursor filter is exact."""
        scored = self.matches(q)
        if after is not None:
            s, d = float(after[0]), int(after[1])
            scored = scored.filter(
                (F.col("score") < F.lit(s))
                | ((F.col("score") == F.lit(s)) & (F.col("doc_id") > F.lit(d)))
            )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def rescore(
        self,
        first_pass: DataFrame,
        q: ir.Query,
        *,
        weight: float = 1.0,
        k: int = 10,
    ) -> DataFrame:
        """``QueryRescorer.rescore`` (``search/QueryRescorer.java:50-116``
        and the static helper ``:139-151``): re-rank an existing top-N by
        ``firstPassScore + weight * secondPassScore`` for hits that match
        the rescore query; non-matching hits keep their first-pass score
        (``combine(firstPassScore, secondPassMatches, secondPassScore)``).

        ``first_pass`` is a (doc_id, score) frame (normally a collected-N
        ``topk`` result). The second-pass query scores ALL its matches
        once (one distributed job) and broadcast-joins onto the small
        first-pass set — never per-hit work, so the plan is the same at
        100× corpus size. Float mode mirrors Lucene's static-helper
        combine (double weight, double accumulate, one final float
        rounding — ``QueryRescorer.java:184-188``); double mode is plain
        double arithmetic (the oracle contract)."""
        second = self.matches(q).withColumnRenamed("score", "s2")
        return rescore_combine(
            first_pass, second, weight=weight, k=k, mode=self.mode
        )

    def count(self, q: ir.Query) -> int:
        return self.matches(q).count()

    def matches(self, q: ir.Query) -> DataFrame:
        """DataFrame (doc_id, score) of all matching docs."""
        q = rewrite(q)
        self._prefetch_stats(q)
        return self._eval(q, 1.0)

    # ------------------------------------------------------------- explain
    def explain(self, q: ir.Query, doc_id: int) -> dict:
        """``IndexSearcher.explain`` role (``search/IndexSearcher.java:720``
        → ``Weight.explain``): a nested score breakdown for one document.

        Invariant (the reference's CheckHits contract): the top ``value``
        is the EXACT engine score — every node's value comes from running
        that subtree through the executor restricted to ``doc_id``, so
        explain can never drift from search. ``details`` decompose
        boolean shapes clause-by-clause and term leaves into
        (boost, idf(df), tf/norm inputs).

        ONE Spark job total: a pre-order collection pass enumerates every
        subtree whose value the rendering needs (same traversal as
        ``_explain``), their single-doc frames union into one plan, and
        the rendering pass reads the collected values by cursor — a
        10-clause boolean explain is no longer ~20 driver-blocking jobs."""
        q = rewrite(q)
        self._prefetch_stats(q)
        doc_id = int(doc_id)
        nodes: list[tuple[ir.Query, float]] = []
        self._collect_explain_nodes(q, 1.0, nodes)
        vals: dict[int, float] = {}
        if nodes:
            frames = [
                self._eval(n, b)
                .filter(F.col("doc_id") == doc_id)
                .select(F.lit(i).alias("_node"), F.col("score").cast("double"))
                for i, (n, b) in enumerate(nodes)
            ]
            u = frames[0]
            for f in frames[1:]:
                u = u.unionAll(f)
            vals = {int(r["_node"]): float(r["score"]) for r in u.collect()}
        self._explain_cursor = [nodes, vals, 0]
        try:
            return self._explain(q, doc_id, 1.0)
        finally:
            self._explain_cursor = None

    def _collect_explain_nodes(
        self, q: ir.Query, boost: float, out: list
    ) -> None:
        """Mirror of ``_explain``'s ``_node_value`` call order (children
        before the boolean parent; BoostQuery delegates to its child)."""
        if isinstance(q, ir.BoostQuery):
            inner_boost = (
                float(_f32(_f32(boost) * _f32(q.boost)))
                if self.mode == "float32"
                else boost * q.boost
            )
            self._collect_explain_nodes(q.query, inner_boost, out)
            return
        if isinstance(q, ir.BooleanQuery):
            for c in q.clauses:
                sub_boost = (
                    1.0
                    if c.occur in (ir.Occur.FILTER, ir.Occur.MUST_NOT)
                    else boost
                )
                self._collect_explain_nodes(c.query, sub_boost, out)
            out.append((q, boost))
            return
        out.append((q, boost))

    def _node_value(self, q: ir.Query, doc_id: int, boost: float):
        cur = getattr(self, "_explain_cursor", None)
        if cur is not None:
            nodes, vals, i = cur
            cur[2] = i + 1
            return vals.get(i)
        rows = (
            self._eval(q, boost)
            .filter(F.col("doc_id") == doc_id)
            .select("score")
            .collect()
        )
        return float(rows[0]["score"]) if rows else None

    def _explain(self, q: ir.Query, doc_id: int, boost: float) -> dict:
        def miss(desc):
            return {"match": False, "value": 0.0, "description": f"no match: {desc}"}

        if isinstance(q, ir.BoostQuery):
            inner_boost = (
                float(_f32(_f32(boost) * _f32(q.boost)))
                if self.mode == "float32"
                else boost * q.boost
            )
            e = self._explain(q.query, doc_id, inner_boost)
            return {
                "match": e["match"],
                "value": e["value"],
                "description": f"boost({q.boost}) of:",
                "details": [e],
            }
        if isinstance(q, ir.BooleanQuery):
            details, total = [], None
            for c in q.clauses:
                sub_boost = 1.0 if c.occur in (ir.Occur.FILTER, ir.Occur.MUST_NOT) else boost
                e = self._explain(c.query, doc_id, sub_boost)
                e = dict(e, occur=c.occur.value)
                details.append(e)
            v = self._node_value(q, doc_id, boost)
            if v is None:
                return dict(miss("boolean"), details=details)
            return {
                "match": True,
                "value": v,
                "description": "sum of:",
                "details": details,
            }
        if isinstance(q, ir.TermQuery):
            df, ttf = self._stats_cache.get(q.term, (0, 0))
            v = self._node_value(q, doc_id, boost)
            if v is None:
                return miss(f"term {q.term!r}")
            n = self.index.doc_count
            det = [
                {"value": float(boost), "description": "boost"},
                {
                    "value": float(np.log(1.0 + (n - df + 0.5) / (df + 0.5))),
                    "description": f"idf, computed from n={n}, df={df}",
                },
                {
                    "value": int(ttf),
                    "description": "ttf (collection totalTermFreq)",
                },
            ]
            return {
                "match": True,
                "value": v,
                "description": f"weight({q.term}) [{self._sim_name()}], product of:",
                "details": det,
            }
        # generic node: exact value + structural description
        v = self._node_value(q, doc_id, boost)
        if v is None:
            return miss(type(q).__name__)
        return {
            "match": True,
            "value": v,
            "description": f"{type(q).__name__} [{self._sim_name()}]",
        }

    def _sim_name(self) -> str:
        return getattr(self.similarity, "name", None) or "bm25"

    # ------------------------------------------------------- stats plumbing
    def _prefetch_stats(self, q: ir.Query) -> None:
        """ONE dictionary lookup for all leaf terms of the query tree (the
        role of TermStates/IndexReaderContext stats gathering)."""
        self._prefetch_terms(_collect_terms(q))

    def _prefetch_terms(self, term_set: set[str]) -> None:
        terms = sorted(term_set - set(self._stats_cache))
        if not terms:
            return
        rows = (
            self.index.term_stats.filter(F.col("term").isin(terms))
            .select("term", "df", "ttf")
            .collect()
        )
        found = {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}
        for t in terms:
            self._stats_cache[t] = found.get(t, (0, 0))

    def _df(self, term: str) -> int:
        if term not in self._stats_cache:
            self._prefetch_stats(ir.TermQuery(term))
        return self._stats_cache[term][0]

    @property
    def _avgdl_f32(self) -> np.float32:
        return bm25.avg_field_length(self.index.sum_ttf, self.index.doc_count)

    @property
    def _avgdl_double(self) -> float:
        return self.index.sum_ttf / float(self.index.doc_count)

    def _norms(self) -> DataFrame:
        n = self.index.norms
        if self.index.doc_count <= self.broadcast_norms_threshold:
            return F.broadcast(n)
        return n

    # ------------------------------------------------------------- scoring
    def _score_f32_udf(self, weight: np.float32):
        cache = bm25.norm_inverse_cache(self.k1, self.b, self._avgdl_f32)
        w = np.float32(weight)

        @F.pandas_udf(T.FloatType())
        def score_udf(tf: pd.Series, norm: pd.Series) -> pd.Series:
            # tf may be int (term/exact phrase) or float32 (sloppy phrase)
            s = bm25.score(
                tf.to_numpy(), norm.to_numpy(np.int64), weight=w, cache=cache
            )
            return pd.Series(s, index=tf.index)

        return score_udf

    def _score_double_col(self, weight) -> Column:
        """Built-in double expression: w - w/(1 + tf * inv(norm)).  The norm
        byte decodes through the SmallFloat LUT as a CASE-free expression:
        join-free via element_at on a literal 256-array.  ``weight`` may be
        a Column (per-term weights — scored multi-term rewrites)."""
        lut = F.lit(bm25.LENGTH_TABLE_F32.astype(float).tolist())
        declen = F.element_at(lut, F.col("norm") + 1)
        inv = F.lit(1.0) / (
            F.lit(float(self.k1))
            * (
                F.lit(1.0 - self.b)
                + F.lit(float(self.b)) * declen / F.lit(self._avgdl_double)
            )
        )
        w = weight if isinstance(weight, Column) else F.lit(float(weight))
        return w - w / (F.lit(1.0) + F.col("tf").cast("double") * inv)

    def _scored_term_rows(self, rows: DataFrame, weight) -> DataFrame:
        """(doc_id, tf) rows + norm join → (doc_id, score)."""
        with_norm = rows.join(self._norms(), "doc_id")
        if self.similarity is not None:
            sim = self.similarity
            if self.mode == "float32":
                @F.pandas_udf(T.FloatType())
                def sim_udf(tf: pd.Series, norm: pd.Series) -> pd.Series:
                    s = sim.score(
                        tf.to_numpy(), norm.to_numpy(np.int64), weight, "float32"
                    )
                    return pd.Series(s, index=tf.index)

                return with_norm.select(
                    "doc_id", sim_udf(F.col("tf"), F.col("norm")).alias("score")
                )
            # double mode ALSO scores in the numpy kernel (Arrow UDF):
            # the log calls must hit the platform libm (math.log) to stay
            # bit-identical to the DuckDB oracle — JVM Math.log rounds
            # differently on ~1-ulp of inputs
            @F.pandas_udf(T.DoubleType())
            def sim_udf64(tf: pd.Series, norm: pd.Series) -> pd.Series:
                s = sim.score(
                    tf.to_numpy(), norm.to_numpy(np.int64), weight, "double"
                )
                return pd.Series(s, index=tf.index)

            return with_norm.select(
                "doc_id", sim_udf64(F.col("tf"), F.col("norm")).alias("score")
            )
        if self.mode == "float32":
            udf = self._score_f32_udf(weight)
            return with_norm.select(
                "doc_id", udf(F.col("tf"), F.col("norm")).alias("score")
            )
        return with_norm.select(
            "doc_id", self._score_double_col(float(weight)).alias("score")
        )

    def _term_weight(self, boost: float, df: int, ttf: int = 0):
        if self.similarity is not None:
            return self.similarity.term_weight(
                boost, df, ttf, self.index.doc_count, self.index.sum_ttf
            )
        if self.mode == "float32":
            return bm25.term_weight(boost, bm25.idf(df, self.index.doc_count))
        import math

        n = self.index.doc_count
        return boost * math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def _sum_weight(self, boost: float, dfs, ttfs=None):
        if self.similarity is not None:
            stats = list(zip(dfs, ttfs if ttfs is not None else [0] * len(dfs)))
            return self.similarity.sum_weight(
                boost, stats, self.index.doc_count, self.index.sum_ttf
            )
        if self.mode == "float32":
            return bm25.term_weight(boost, bm25.idf_sum(dfs, self.index.doc_count))
        import math

        n = self.index.doc_count
        return boost * sum(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) for df in dfs)

    def _score_type(self) -> str:
        return "float" if self.mode == "float32" else "double"

    def _cast(self, col: Column) -> Column:
        return col.cast(self._score_type())

    # ---------------------------------------------------------- evaluation
    def _eval(self, q: ir.Query, boost: float) -> DataFrame:  # noqa: C901
        ix = self.index
        if isinstance(q, ir.TermQuery):
            if self._df(q.term) == 0:
                return self._empty()
            rows = ix.postings_slim.filter(F.col("term") == q.term).select("doc_id", "tf")
            return self._scored_term_rows(
                rows, self._term_weight(boost, *self._stats_cache[q.term])
            )
        if isinstance(q, ir.BoostQuery):
            inner_boost = (
                float(_f32(_f32(boost) * _f32(q.boost)))
                if self.mode == "float32"
                else boost * q.boost
            )
            return self._eval(q.query, inner_boost)
        if isinstance(q, ir.ConstantScoreQuery):
            inner = self._eval(q.query, 1.0)
            return inner.select(
                "doc_id", F.lit(float(_f32(boost))).cast(self._score_type()).alias("score")
            )
        if isinstance(q, ir.MatchAllDocsQuery):
            return ix.docs.select(
                "doc_id", F.lit(float(_f32(boost))).cast(self._score_type()).alias("score")
            )
        if isinstance(q, ir.MatchNoDocsQuery):
            return self._empty()
        if isinstance(q, ir.TermInSetQuery):
            rows = ix.postings_slim.filter(F.col("term").isin(list(q.terms)))
            return rows.select("doc_id").distinct().select(
                "doc_id", F.lit(float(_f32(boost))).cast(self._score_type()).alias("score")
            )
        if isinstance(q, ir.CoveringQuery):
            # CoveringQuery (sandbox/search/CoveringQuery.java:44-84 +
            # CoveringScorer): count matching sub queries per doc, keep
            # docs where the count reaches the per-doc long source
            # (clamped to >= 1; NULL never matches), score = sum of the
            # matching clauses.  One union + one groupBy — the dynamic
            # minimum never becomes a per-doc loop.
            subs = [self._eval(s, boost) for s in q.queries]
            u = subs[0]
            for s in subs[1:]:
                u = u.unionByName(s)
            # float leaf scores, double accumulator — Scorer.score()
            # returns float in the reference, and f32 addends make the
            # unordered distributed sum exact (order-independent)
            agg = u.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("_n"),
                self._cast(
                    F.sum(
                        F.col("score").cast("float").cast("double")
                    )
                ).alias("score"),
            )
            # NULL source values never match (CoveringQuery.java:62-65):
            # filter BEFORE clamping — Spark's greatest() skips NULLs,
            # so clamp-then-filter would resurrect them
            raw_mm = F.expr(q.min_match_expr).cast("long")
            thr = (
                ix.docs.select("doc_id", raw_mm.alias("_raw"))
                .filter(F.col("_raw").isNotNull())
                .select(
                    "doc_id",
                    F.greatest(F.col("_raw"), F.lit(1)).alias("_mm"),
                )
            )
            return (
                agg.join(thr, "doc_id")
                .filter(F.col("_n") >= F.col("_mm"))
                .select("doc_id", "score")
            )
        if isinstance(q, ir.FuzzyQuery) and not q.constant_score:
            return self._eval_scored_fuzzy(q, boost)
        if isinstance(q, ir.BlendedTermQuery):
            return self._eval_blended(q, boost)
        if isinstance(q, ir.FuzzyQuery):
            # constant-score fuzzy: intersect the automaton with the TERM
            # dictionary first (per-term — the OSA refinement UDF runs
            # once per length-band candidate term, never per posting),
            # then broadcast the tiny matched term set onto the postings
            # scan. Same OSA metric as the scored path, so the match set
            # of FuzzyQuery(t, k) is identical whichever rewrite runs.
            matched = ix.term_stats.filter(multiterm_cond(q)).select("term")
            rows = (
                ix.postings_slim.join(F.broadcast(matched), "term", "left_semi")
                .select("doc_id")
                .distinct()
            )
            return rows.select(
                "doc_id", F.lit(float(_f32(boost))).cast(self._score_type()).alias("score")
            )
        if (
            isinstance(q, (ir.PrefixQuery, ir.WildcardQuery, ir.RegexpQuery))
            and not q.constant_score
        ):
            return self._eval_scored_multiterm(q, boost)
        if isinstance(q, _MULTITERM_TYPES):
            # constant-score multi-term rewrite, FULLY DISTRIBUTED: the
            # term predicate is pushed straight into the postings scan —
            # the Catalyst analog of Lucene's per-segment
            # automaton∩dictionary intersection
            # (MultiTermQueryConstantScoreWrapper.java:39); no term list
            # ever collects to the driver, so a 10^9-term dictionary and a
            # broad prefix cost one pruned scan, not a giant IN-list.
            # (maxClauseCount guards only the *scoring* boolean rewrite
            # above — constant-score is exempt, like the reference.)
            rows = ix.postings_slim.filter(multiterm_cond(q)).select("doc_id").distinct()
            return rows.select(
                "doc_id", F.lit(float(_f32(boost))).cast(self._score_type()).alias("score")
            )
        if isinstance(q, ir.SynonymQuery):
            dfs = [self._df(t) for t in q.terms]
            df_max = max(dfs, default=0)
            if df_max == 0:
                return self._empty()
            # SynonymQuery pseudo-term stats: df = max, ttf = sum
            ttf_sum = sum(self._stats_cache[t][1] for t in q.terms)
            rows = (
                ix.postings_slim.filter(F.col("term").isin(list(q.terms)))
                .groupBy("doc_id")
                .agg(F.sum("tf").alias("tf"))
            )
            return self._scored_term_rows(
                rows, self._term_weight(boost, df_max, ttf_sum)
            )
        if isinstance(q, ir.PhraseQuery):
            return self._eval_phrase(q, boost)
        if isinstance(q, ir.MultiPhraseQuery):
            return self._eval_multi_phrase(q, boost)
        if isinstance(q, ir.DisjunctionMaxQuery):
            subs = [self._eval(s, boost) for s in q.queries]
            unioned = reduce(DataFrame.unionAll, subs)
            agg = unioned.groupBy("doc_id").agg(
                F.max(F.col("score").cast("double")).alias("_mx"),
                F.sum(F.col("score").cast("double")).alias("_sm"),
            )
            return agg.select(
                "doc_id",
                self._cast(
                    F.col("_mx") + (F.col("_sm") - F.col("_mx")) * F.lit(float(q.tie_breaker))
                ).alias("score"),
            )
        if isinstance(q, _SPAN_TYPES):
            return self._eval_span(q, boost)
        if isinstance(q, ir.BooleanQuery):
            return self._eval_boolean(q, boost)
        raise TypeError(f"unsupported query type {type(q).__name__}")

    def _expand_span(self, q: ir.Query) -> ir.Query:
        """SpanMultiTermQueryWrapper expansion against THIS index's
        dictionary (SCORING_SPAN_QUERY_REWRITE,
        ``spans/SpanMultiTermQueryWrapper.java:146-162``): the term
        predicate pushes into the term-sorted term_stats parquet scan, so
        a broad prefix prunes row groups; only the matching terms (capped
        at MAX_CLAUSE_COUNT) reach the driver."""
        from lucene_solr_spark.plans.span_rewrite import expand_span_wrappers

        def expand(mq: ir.Query) -> list[str]:
            rows = (
                self.index.term_stats.filter(multiterm_cond(mq))
                .select("term")
                .limit(ir.MAX_CLAUSE_COUNT + 1)
                .collect()
            )
            return [r["term"] for r in rows]

        return expand_span_wrappers(q, expand)

    def _eval_span(self, q: ir.Query, boost: float) -> DataFrame:
        """Span algebra (near/or/not/within/containing over term
        sub-spans): positions-array joins + the shared span kernel
        (oracle.spans.eval_spans) — same two-phase shape as phrases.
        Required terms (present in every possible match) inner-join;
        the rest (OR branches, SpanNot excludes) left-join with an
        empty-array default, so the doc frame never over-prunes."""
        ix = self.index
        q = self._expand_span(q)
        all_terms, positive, required = span_term_sets(q)
        self._prefetch_terms(set(all_terms))
        for t in all_terms:
            self._df(t)
        if any(self._df(t) == 0 for t in required):
            return self._empty()
        # weight: summed idf over the scoring-side terms present in the
        # index (SpanWeight.buildSimWeight merges per-term stats; df==0
        # terms have no TermStatistics and are skipped)
        live = [t for t in positive if self._df(t) > 0]
        if not live:
            return self._empty()
        if "positions" not in ix.postings.columns:
            raise ValueError("index built without positions; span queries need them")

        def part(t: str, i: int) -> DataFrame:
            return ix.postings.filter(F.col("term") == t).select(
                "doc_id", F.col("positions").alias(f"p{i}")
            )

        req_set = set(required)
        order = list(required) + [t for t in all_terms if t not in req_set]
        if required:
            joined = part(order[0], 0)
            for i in range(1, len(required)):
                joined = joined.join(part(order[i], i), "doc_id", "inner")
        else:
            # no term is in every match (pure OR): doc universe = union of
            # docs carrying any scoring-side term
            joined = (
                ix.postings.filter(F.col("term").isin(list(positive)))
                .select("doc_id")
                .distinct()
            )
        pos_type = ix.postings.schema["positions"].dataType
        empty = F.array().cast(pos_type)
        for i in range(len(required), len(order)):
            joined = joined.join(part(order[i], i), "doc_id", "left")
        arrays = F.array(
            *[F.coalesce(F.col(f"p{i}"), empty) for i in range(len(order))]
        )
        terms_in_order = tuple(order)
        node = q

        @F.pandas_udf(T.FloatType())
        def span_freq(pos_lists: pd.Series) -> pd.Series:
            from lucene_solr_spark.oracle.spans import eval_spans, spans_freq

            def one(lists) -> float:
                tp = {
                    t: np.asarray(lists[i], np.int64)
                    for i, t in enumerate(terms_in_order)
                }
                return spans_freq(eval_spans(node, tp))

            return pos_lists.map(one)

        freq = joined.select("doc_id", span_freq(arrays).alias("tf")).filter(
            F.col("tf") > 0
        )
        return self._scored_term_rows(
            freq,
            self._sum_weight(
                boost,
                [self._df(t) for t in live],
                [self._stats_cache[t][1] for t in live],
            ),
        )

    def _eval_scored_fuzzy(self, q: ir.FuzzyQuery, boost: float) -> DataFrame:
        """Reference-DEFAULT fuzzy scoring: TopTermsBlendedFreqScoringRewrite
        (``search/FuzzyQuery.java:34,100`` — the rewrite ctor arg;
        ``search/MultiTermQuery.java:173-212``; ``search/TopTermsRewrite.java``;
        ``search/BlendedTermQuery.java:271-300`` rewrite):

        1. expand to dictionary terms within ``max_edits`` (OSA distance —
           transpositions=true default), each with boost
           1 − ed/min(|term|, |query|) (``FuzzyTermsEnum.java:249-256``);
        2. keep the top ``max_expansions`` terms by (boost desc, term asc)
           — the ScoreTerm priority-queue order (``TopTermsRewrite.java:210-213``);
        3. BLEND document frequencies: df := max over the kept terms
           (``BlendedTermQuery.java:281-286``), so rare typo-terms do not
           out-rank the exact term;
        4. score as a disjunction of boosted TermQueries that all use the
           blended df for idf (BOOLEAN_REWRITE, ``BlendedTermQuery.java:138-149``).

        Scale shape: the expansion is computed ON the distributed
        dictionary (length-band + prefix pushdown prune the term-sorted
        parquet, then an Arrow-batched OSA kernel over the pruned slice);
        only the top-N (term, df, ed) rows ever reach the driver."""
        ix = self.index
        qterm = q.term
        me = int(q.max_edits)
        cond = F.length("term").between(len(qterm) - me, len(qterm) + me)
        if q.prefix_length:
            cond = F.col("term").startswith(qterm[: q.prefix_length]) & cond

        @F.pandas_udf(T.IntegerType())
        def osa_udf(terms: pd.Series) -> pd.Series:
            from lucene_solr_spark.oracle.editdist import osa_batch

            return pd.Series(
                osa_batch(terms.tolist(), qterm, me), index=terms.index
            )

        b_col = F.when(F.col("_ed") == 0, F.lit(1.0)).otherwise(
            F.lit(1.0)
            - F.col("_ed").cast("double")
            / F.least(F.length("term"), F.lit(len(qterm))).cast("double")
        )
        top = (
            ix.term_stats.filter(cond)
            .select("term", "df")
            .withColumn("_ed", osa_udf(F.col("term")))
            .filter(F.col("_ed") <= me)
            .withColumn("_boost", b_col)
            .orderBy(F.desc("_boost"), F.asc("term"))
            .limit(int(q.max_expansions))
            .collect()
        )
        if not top:
            return self._empty()
        df_blend = max(int(r["df"]) for r in top)

        w_rows = []
        for r in top:
            ed, t = int(r["_ed"]), r["term"]
            if self.mode == "float32":
                bt = (
                    np.float32(1.0)
                    if ed == 0
                    else np.float32(1.0)
                    - np.float32(ed) / np.float32(min(len(t), len(qterm)))
                )
                w = float(
                    bm25.term_weight(
                        float(np.float32(np.float32(boost) * bt)),
                        bm25.idf(df_blend, ix.doc_count),
                    )
                )
            else:
                import math

                n = ix.doc_count
                w = (boost * float(r["_boost"])) * math.log(
                    1.0 + (n - df_blend + 0.5) / (df_blend + 0.5)
                )
            w_rows.append((t, w))
        return self._scored_disjunction(w_rows)

    def _eval_blended(self, q: "ir.BlendedTermQuery", boost: float) -> DataFrame:
        """Pre-expanded BlendedTermQuery leaf (round 5): the same weight
        chain as ``_eval_scored_fuzzy`` steps 3-4, with the expansion and
        blended df already carried on the node — so a FuzzyQuery lowered
        by the kernel's ``_expand_scored`` and the DF-native fuzzy path
        produce bit-identical scores."""
        ix = self.index
        w_rows = []
        for t, ed in zip(q.terms, q.edits):
            if self.mode == "float32":
                bt = (
                    np.float32(1.0)
                    if ed == 0
                    else np.float32(1.0)
                    - np.float32(ed) / np.float32(min(len(t), q.query_len))
                )
                w = float(
                    bm25.term_weight(
                        float(np.float32(np.float32(boost) * bt)),
                        bm25.idf(q.df_blend, ix.doc_count),
                    )
                )
            else:
                import math

                bt_d = 1.0 if ed == 0 else 1.0 - ed / min(len(t), q.query_len)
                w = (boost * bt_d) * math.log(
                    1.0 + (ix.doc_count - q.df_blend + 0.5) / (q.df_blend + 0.5)
                )
            w_rows.append((t, w))
        return self._scored_disjunction(w_rows)

    def _eval_scored_multiterm(self, q: ir.Query, boost: float) -> DataFrame:
        """MultiTermQuery.SCORING_BOOLEAN_REWRITE for Prefix / Wildcard /
        Regexp (``search/ScoringRewrite.java:67-74`` addClause): each
        dictionary term matching the automaton becomes a SHOULD TermQuery
        scored with its OWN df (NO df blending — that is fuzzy's
        TopTermsBlendedFreq rewrite), boost identical across terms (only
        FuzzyTermsEnum sets a BoostAttribute; ``TopTermsRewrite.java:110``).
        Expansion past MAX_CLAUSE_COUNT raises TooManyClauses
        (``MultiTermQuery.java:40``).

        Scale shape: the term predicate pushes into the term-sorted
        term_stats parquet scan (row-group pruned for prefixes); only the
        matching (term, df) rows — ≤1024 by the cap — reach the driver."""
        ix = self.index
        # TOP_TERMS_SCORING_BOOLEAN_REWRITE(N) truncates instead of
        # erroring: at the constant boost of non-fuzzy multi-term queries
        # the ScoreTerm priority-queue order (boost desc, then smaller
        # term wins — TopTermsRewrite.java:210-213) keeps exactly the N
        # lexicographically smallest matches, which is this orderBy+limit.
        top_n = getattr(q, "max_expansions", None)
        # TopTermsRewrite.java:66: maxSize = min(size, getMaxClauseCount())
        # — the PQ never outgrows the clause cap even for huge top_n
        cap = ir.MAX_CLAUSE_COUNT if top_n is None else min(int(top_n), ir.MAX_CLAUSE_COUNT)
        rows = (
            ix.term_stats.filter(multiterm_cond(q))
            .select("term", "df", "ttf")
            .orderBy("term")
            .limit(cap + 1)
            .collect()
        )
        if len(rows) > cap:
            if top_n is not None:
                rows = rows[:cap]
            else:
                raise ir.TooManyClauses(
                    f"scoring rewrite expanded past {ir.MAX_CLAUSE_COUNT} terms"
                )
        if not rows:
            return self._empty()
        w_rows = [
            (r["term"], float(self._term_weight(boost, int(r["df"]), int(r["ttf"]))))
            for r in rows
        ]
        return self._scored_disjunction(w_rows)

    def _scored_disjunction(self, w_rows: list[tuple[str, float]]) -> DataFrame:
        """Disjunction-sum of per-term BM25 scores for an explicit
        (term, weight) expansion list — the shared tail of the scored
        multi-term rewrites. One broadcast weight join, one norm join,
        and a TERM-SORTED double fold per doc (see the order note below)."""
        ix = self.index
        spark = ix.postings.sparkSession
        wdf = F.broadcast(
            spark.createDataFrame(w_rows, "term string, _w double")
        )
        rows = ix.postings_slim.filter(
            F.col("term").isin([t for t, _ in w_rows])
        )
        with_norm = rows.join(wdf, "term").join(self._norms(), "doc_id")
        if self.mode == "float32":
            cache = bm25.norm_inverse_cache(self.k1, self.b, self._avgdl_f32)

            @F.pandas_udf(T.FloatType())
            def fz_score(tf: pd.Series, norm: pd.Series, w: pd.Series) -> pd.Series:
                f = tf.to_numpy(np.float32)
                nb = norm.to_numpy(np.int64)
                ww = w.to_numpy(np.float32)  # exact: stored doubles are f32 values
                one = np.float32(1.0)
                s = (ww - ww / (one + f * cache[nb])).astype(np.float32)
                return pd.Series(s, index=tf.index)

            per = with_norm.select(
                "doc_id",
                "term",
                fz_score(F.col("tf"), F.col("norm"), F.col("_w")).alias("_s"),
            )
        else:
            per = with_norm.select(
                "doc_id", "term", self._score_double_col(F.col("_w")).alias("_s")
            )
        # disjunction sum over the expansion clauses. A raw double sum is
        # ORDER-SENSITIVE in the last ulp with 3+ clauses and Spark's SUM
        # order is nondeterminate, so fold in term-sorted order — within
        # the reference contract (Lucene's own heap order is unspecified)
        # and reproducible; the double-mode fold is mirrored 1:1 by the
        # SQL oracle's list(s ORDER BY term) left fold.
        xs = F.sort_array(
            F.collect_list(F.struct("term", F.col("_s").cast("double").alias("_s")))
        )
        return per.groupBy("doc_id").agg(
            self._cast(
                F.aggregate(xs, F.lit(0.0), lambda acc, x: acc + x["_s"])
            ).alias("score")
        )

    def _filter_matches(self, c: ir.Query) -> DataFrame:
        """Filter-context match-set (doc_id only, no scores). Served from
        the LRU query cache when one is attached and its usage-tracking
        policy admits the query (LRUQueryCache caches only filter-context
        clauses — scoring clauses are never cached)."""
        if self.query_cache is None:
            return self._eval(c, 1.0).select("doc_id")
        return self.query_cache.get_or_compute(
            c, lambda: self._eval(c, 1.0).select("doc_id")
        )

    def _eval_boolean(self, q: ir.BooleanQuery, boost: float) -> DataFrame:
        musts = [self._eval(c, boost) for c in q.by_occur(ir.Occur.MUST)]
        filters = [self._filter_matches(c) for c in q.by_occur(ir.Occur.FILTER)]
        should_qs = q.by_occur(ir.Occur.SHOULD)
        shoulds = [self._eval(c, boost) for c in should_qs]
        nots = [self._filter_matches(c) for c in q.by_occur(ir.Occur.MUST_NOT)]
        msm = q.min_should_match

        # required side: conjunction = chained inner joins on doc_id
        req: DataFrame | None = None
        if musts:
            req = musts[0].withColumnRenamed("score", "s0")
            for i, m in enumerate(musts[1:], 1):
                req = req.join(
                    m.withColumnRenamed("score", f"s{i}"), "doc_id", "inner"
                )
            total = reduce(
                lambda a, c: a + c,
                [F.col(f"s{i}").cast("double") for i in range(len(musts))],
            )
            req = req.select("doc_id", self._cast(total).alias("score"))
        for f in filters:
            req = f.withColumn("score", F.lit(0.0).cast(self._score_type())) if req is None else req.join(f, "doc_id", "left_semi")

        # optional side: disjunction-sum with match count (for msm)
        opt: DataFrame | None = None
        if shoulds:
            unioned = reduce(DataFrame.unionAll, shoulds)
            opt = unioned.groupBy("doc_id").agg(
                self._cast(F.sum(F.col("score").cast("double"))).alias("opt_score"),
                F.count("*").alias("n_matching"),
            )

        if req is not None:
            out = req
            if opt is not None:
                if msm > 0:
                    joined = out.join(opt, "doc_id", "inner").filter(
                        F.col("n_matching") >= msm
                    )
                    # conjunction(musts..., WAND(shoulds,msm)): double sum of
                    # the f32 req total and the f32 WAND total
                    out = joined.select(
                        "doc_id",
                        self._cast(
                            F.col("score").cast("double")
                            + F.col("opt_score").cast("double")
                        ).alias("score"),
                    )
                else:
                    joined = out.join(opt, "doc_id", "left")
                    # ReqOptSumScorer: FLOAT add (ReqOptSumScorer.java:273)
                    out = joined.select(
                        "doc_id",
                        F.when(
                            F.col("opt_score").isNotNull(),
                            self._cast(F.col("score") + F.col("opt_score")),
                        )
                        .otherwise(F.col("score"))
                        .alias("score"),
                    )
        else:
            if opt is None:
                return self._empty()
            need = max(msm, 1)
            out = opt.filter(F.col("n_matching") >= need).select(
                "doc_id", F.col("opt_score").alias("score")
            )

        for n in nots:
            out = out.join(n, "doc_id", "left_anti")
        return out

    def _eval_phrase(self, q: ir.PhraseQuery, boost: float) -> DataFrame:
        ix = self.index
        dfs = [self._df(t) for t in q.terms]
        if min(dfs, default=0) == 0:
            return self._empty()
        if "positions" not in ix.postings.columns:
            raise ValueError("index built without positions; phrase queries need them")
        # conjunction approximation: join positions arrays per term
        parts = []
        for i, t in enumerate(q.terms):
            parts.append(
                ix.postings.filter(F.col("term") == t).select(
                    "doc_id", F.col("positions").alias(f"p{i}")
                )
            )
        joined = parts[0]
        for p in parts[1:]:
            joined = joined.join(p, "doc_id", "inner")
        arrays = F.array(*[F.col(f"p{i}") for i in range(len(q.terms))])
        offsets = tuple(int(p) for p in q.positions)

        slop = q.slop

        if slop == 0:

            @F.pandas_udf(T.IntegerType())
            def phrase_freq(pos_lists: pd.Series) -> pd.Series:
                """ExactPhraseMatcher: count base positions where every term
                i appears at base + offset_i (ExactPhraseMatcher.java:109-155)."""
                base_off = offsets[0]

                def count(lists) -> int:
                    cand = np.asarray(lists[0], dtype=np.int64) - base_off
                    for i in range(1, len(offsets)):
                        nxt = np.asarray(lists[i], dtype=np.int64) - offsets[i]
                        cand = np.intersect1d(cand, nxt, assume_unique=True)
                        if cand.size == 0:
                            return 0
                    return int(cand.size)

                return pos_lists.map(count)

        else:

            qterms = tuple(q.terms)

            @F.pandas_udf(T.FloatType())
            def phrase_freq(pos_lists: pd.Series) -> pd.Series:
                """SloppyPhraseMatcher: float freq = Σ 1/(1+matchLength)
                (oracle.sloppy kernel — shared with the oracle); repeated
                query terms take the rptGroups machinery."""
                from lucene_solr_spark.oracle.sloppy import sloppy_phrase_freq

                return pos_lists.map(
                    lambda lists: sloppy_phrase_freq(
                        [np.asarray(x, np.int64) for x in lists],
                        list(offsets),
                        slop,
                        terms=list(qterms),
                    )
                )

        freq = joined.select("doc_id", phrase_freq(arrays).alias("tf")).filter(
            F.col("tf") > 0
        )
        return self._scored_term_rows(
            freq,
            self._sum_weight(
                boost, dfs, [self._stats_cache[t][1] for t in q.terms]
            ),
        )

    def sloppy_match_stats(self, q) -> DataFrame:
        """Integer artifact of the greedy SloppyPhraseMatcher
        (``search/SloppyPhraseMatcher.java:174-206``): per matching doc,
        the count and sum of accepted match lengths (``matchLength <=
        slop`` at ``:169``). The float sloppy score is the float32 fold of
        the same sequence — so this is the exactly-SQL-gateable view of
        the sloppy machinery (for 2 terms the sequence has a closed
        alternating-successor form over the position lists; for a 2-slot
        MultiPhrase with a shared term — hasMultiTermRpts — the same
        chain gains the collision-resolution step, see
        __spark_entry__.oracle_sql['sloppy_multi_repeat_matches']).
        Accepts PhraseQuery or MultiPhraseQuery (union position lists per
        slot, UnionPostingsEnum role)."""
        if q.slop <= 0:
            raise ValueError("sloppy_match_stats needs slop > 0")
        ix = self.index
        if isinstance(q, ir.MultiPhraseQuery):
            groups = [tuple(g) for g in q.term_groups]
        else:
            groups = [(t,) for t in q.terms]
        if any(all(self._df(t) == 0 for t in g) for g in groups):
            return ix.postings.sparkSession.createDataFrame(
                [], schema="doc_id long, n_matches long, sum_ml long"
            )
        parts = []
        for i, g in enumerate(groups):
            if len(g) == 1:
                parts.append(
                    ix.postings.filter(F.col("term") == g[0]).select(
                        "doc_id", F.col("positions").alias(f"p{i}")
                    )
                )
            else:
                parts.append(
                    ix.postings.filter(F.col("term").isin(list(g)))
                    .groupBy("doc_id")
                    .agg(
                        F.array_sort(
                            F.array_distinct(
                                F.flatten(F.collect_list("positions"))
                            )
                        ).alias(f"p{i}")
                    )
                )
        joined = parts[0]
        for p in parts[1:]:
            joined = joined.join(p, "doc_id", "inner")
        arrays = F.array(*[F.col(f"p{i}") for i in range(len(groups))])
        offsets = tuple(int(p) for p in q.positions)
        slop = q.slop

        qterms = tuple(frozenset(g) for g in groups)

        @F.pandas_udf("n_matches long, sum_ml long")
        def match_stats(pos_lists: pd.Series) -> pd.DataFrame:
            from lucene_solr_spark.oracle.sloppy import (
                sloppy_phrase_match_lengths,
            )

            ns, sums = [], []
            for lists in pos_lists:
                mls = sloppy_phrase_match_lengths(
                    [np.asarray(x, np.int64) for x in lists],
                    list(offsets),
                    slop,
                    terms=list(qterms),
                )
                ns.append(len(mls))
                sums.append(int(sum(mls)))
            return pd.DataFrame({"n_matches": ns, "sum_ml": sums})

        out = joined.select("doc_id", match_stats(arrays).alias("ms"))
        return out.select(
            "doc_id", F.col("ms.n_matches").alias("n_matches"),
            F.col("ms.sum_ml").alias("sum_ml"),
        ).filter(F.col("n_matches") > 0)

    def _eval_multi_phrase(self, q: "ir.MultiPhraseQuery", boost: float) -> DataFrame:
        """Per-slot union of the group's postings (UnionPostingsEnum role):
        positions flattened+deduped per doc, then the same exact/sloppy
        phrase machinery as _eval_phrase."""
        ix = self.index
        all_terms = list(q.all_terms)
        # df==0 terms are excluded from the summed idf (MultiPhraseQuery.java:234)
        live_terms = [t for t in all_terms if self._df(t) > 0]
        dfs = [self._df(t) for t in live_terms]
        ttfs = [self._stats_cache[t][1] for t in live_terms]
        if any(all(self._df(t) == 0 for t in g) for g in q.term_groups):
            return self._empty()
        parts = []
        for i, g in enumerate(q.term_groups):
            slot = (
                ix.postings.filter(F.col("term").isin(list(g)))
                .groupBy("doc_id")
                .agg(
                    F.array_sort(
                        F.array_distinct(F.flatten(F.collect_list("positions")))
                    ).alias(f"p{i}")
                )
            )
            parts.append(slot)
        joined = parts[0]
        for p_ in parts[1:]:
            joined = joined.join(p_, "doc_id", "inner")
        arrays = F.array(*[F.col(f"p{i}") for i in range(len(q.term_groups))])
        offsets = tuple(int(p_) for p_ in q.positions)
        slop = q.slop

        if slop == 0:

            @F.pandas_udf(T.IntegerType())
            def mp_freq(pos_lists: pd.Series) -> pd.Series:
                base_off = offsets[0]

                def count(lists) -> int:
                    cand = np.asarray(lists[0], dtype=np.int64) - base_off
                    for i in range(1, len(offsets)):
                        nxt = np.asarray(lists[i], dtype=np.int64) - offsets[i]
                        cand = np.intersect1d(cand, nxt, assume_unique=True)
                        if cand.size == 0:
                            return 0
                    return int(cand.size)

                return pos_lists.map(count)

        else:

            slot_terms = tuple(frozenset(g) for g in q.term_groups)

            @F.pandas_udf(T.FloatType())
            def mp_freq(pos_lists: pd.Series) -> pd.Series:
                from lucene_solr_spark.oracle.sloppy import sloppy_phrase_freq

                return pos_lists.map(
                    lambda lists: sloppy_phrase_freq(
                        [np.asarray(x, np.int64) for x in lists],
                        list(offsets),
                        slop,
                        terms=list(slot_terms),
                    )
                )

        freq = joined.select("doc_id", mp_freq(arrays).alias("tf")).filter(
            F.col("tf") > 0
        )
        return self._scored_term_rows(freq, self._sum_weight(boost, dfs, ttfs))

    def _empty(self) -> DataFrame:
        spark = self.index.postings.sparkSession
        return spark.createDataFrame(
            [], schema=f"doc_id long, score {self._score_type()}"
        )


def _collect_terms(q: ir.Query) -> set[str]:
    if isinstance(q, ir.TermQuery):
        return {q.term}
    if isinstance(q, (ir.SynonymQuery, ir.TermInSetQuery, ir.SpanNearQuery)):
        return set(q.terms)
    if isinstance(q, _SPAN_TYPES):
        return set(span_term_sets(q)[0])
    if isinstance(q, ir.PhraseQuery):
        return set(q.terms)
    if isinstance(q, ir.MultiPhraseQuery):
        return set(q.all_terms)
    if isinstance(q, ir.BooleanQuery):
        out: set[str] = set()
        for c in q.clauses:
            out |= _collect_terms(c.query)
        return out
    if isinstance(q, (ir.BoostQuery, ir.ConstantScoreQuery)):
        return _collect_terms(q.query)
    if isinstance(q, ir.DisjunctionMaxQuery):
        out = set()
        for s in q.queries:
            out |= _collect_terms(s)
        return out
    return set()
