"""Reverse search (the Lucene *monitor* module, a.k.a. percolator):
register queries once, then stream documents through and report which
registered queries match each document.

Reference surface re-expressed here (lucene/monitor/src/java/org/apache/
lucene/monitor/):

- ``QueryDecomposer.java`` — split disjunctions into independently
  indexable subqueries (:40-118).
- ``QueryAnalyzer.java`` / ``QueryTree.java`` — convert a query into a
  conjunction/disjunction tree and collect the minimal *anchor-term* set
  from the most highly weighted path (conjunctions contribute only their
  heaviest child, disjunctions contribute all children —
  ``QueryTree.java:204-215, 255-262``).
- ``TermWeightor.java:122-134`` — the default length weightor
  ``4 − 3·float32(e^(−0.3·byte_len))`` (longer terms are rarer, so they
  prune candidates harder).
- ``TermFilteredPresearcher.java`` — queries with no extractable terms
  index the ``__ANYTOKEN__`` sentinel and are checked against every
  document (:77-78, 135-139).
- ``MultipassTermFilteredPresearcher.java`` — each extra pass collects
  terms from the *next*-heaviest path (``advancePhase``) into a
  pass-suffixed field; a document is a candidate only if it matches in
  EVERY pass (:37-51).
- ``Monitor.java`` / ``CandidateMatcher`` / ``ScoringMatch.java:42-45``
  — presearcher candidates are confirmed by running the full subquery
  against a single-document index (``DocumentBatch.of(doc)``); a parent
  query matches if ANY of its decomposed parts matches; scoring matches
  sum the parts' scores and drop scores ≤ 0 (:36-39).

Spark-first shape — the whole pipeline is three narrow stages:

1. registration is driver-side (the query set is small by construction —
   it is the *index* here) and yields a broadcastable anchor table
   ``(query_id, sub_ord, pass, term)`` plus a pickled subquery map;
2. candidate selection is ONE broadcast join between the distributed
   distinct ``(doc_id, term)`` frame (the existing tokenizer kernel) and
   the anchor table — no shuffle of document text, Zipf-head doc terms
   hit a tiny hash table;
3. verification tokenizes ONLY candidate documents (mapInPandas over
   ``docs ⋈ candidate-id-lists``) and replays each candidate subquery
   against a per-document index via the existing single-node oracle —
   exactly the MemoryIndex role.

At 100 TB the document side stays embarrassingly parallel: stages 2-3
are map-side after one broadcast; only the distinct doc-term frame is
wide, and it reuses the index build's tokenize pass.
"""

from __future__ import annotations

import math
import pickle
from collections import Counter
from dataclasses import dataclass, field as dc_field
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans import ir

#: TermFilteredPresearcher.java:77-78
ANYTOKEN = "__ANYTOKEN__"


# --------------------------------------------------------------------------
# TermWeightor (TermWeightor.java)
# --------------------------------------------------------------------------

def length_weightor(a: float = 3.0, k: float = 0.3) -> Callable[[str], float]:
    """``TermWeightor.lengthWeightor(3, 0.3)`` — the DEFAULT weightor
    (``TermFilteredPresearcher.DEFAULT_WEIGHTOR``): weight
    ``4 − float32(a·e^(−k·len))`` over the term's UTF-8 byte length,
    table-clamped at 32 (TermWeightor.java:122-134; note the Java
    ``(float)`` cast inside the table)."""
    import numpy as np

    norms = [float(np.float32(a * math.exp(-k * i))) for i in range(32)]

    def weight(term: str) -> float:
        blen = len(term.encode("utf-8"))
        return 4.0 - norms[31 if blen >= 32 else blen]

    return weight


DEFAULT_WEIGHTOR = length_weightor()


def term_freq_weightor(
    frequencies: dict[str, int], n: float, k: float
) -> Callable[[str], float]:
    """``TermWeightor.termFreqWeightor`` — rarer corpus terms weigh more:
    ``(n / freq) + k``, unknown terms weigh 1 (TermWeightor.java:100-112)."""

    def weight(term: str) -> float:
        f = frequencies.get(term)
        return (n / f) + k if f is not None else 1.0

    return weight


# --------------------------------------------------------------------------
# QueryTree (QueryTree.java)
# --------------------------------------------------------------------------


class _Node:
    def weight(self) -> float:
        raise NotImplementedError

    def collect_terms(self, out: list[str]) -> None:
        raise NotImplementedError

    def advance_phase(self, min_weight: float) -> bool:
        raise NotImplementedError


@dataclass
class _TermNode(_Node):
    term: str
    w: float

    def weight(self) -> float:
        return self.w

    def collect_terms(self, out: list[str]) -> None:
        out.append(self.term)

    def advance_phase(self, min_weight: float) -> bool:
        return False  # QueryTree.java:112-115


@dataclass
class _AnyNode(_Node):
    reason: str = ""

    def weight(self) -> float:
        return 0.0  # QueryTree.java:127-129

    def collect_terms(self, out: list[str]) -> None:
        out.append(ANYTOKEN)

    def advance_phase(self, min_weight: float) -> bool:
        return False


class _ConjNode(_Node):
    """Children kept sorted by weight DESC (stable — Java List.sort);
    terms come from the heaviest child only (QueryTree.java:191-215)."""

    def __init__(self, children: list[_Node]):
        self.children = sorted(children, key=lambda c: -c.weight())

    def weight(self) -> float:
        return self.children[0].weight()

    def collect_terms(self, out: list[str]) -> None:
        self.children[0].collect_terms(out)

    def advance_phase(self, min_weight: float) -> bool:
        # QueryTree.java:214-227
        if self.children[0].advance_phase(min_weight):
            self.children.sort(key=lambda c: -c.weight())
            return True
        if len(self.children) == 1:
            return False
        if self.children[1].weight() <= min_weight:
            return False
        self.children.pop(0)
        return True


class _DisjNode(_Node):
    """Children sorted by weight ASC; terms come from ALL children
    (QueryTree.java:245-275)."""

    def __init__(self, children: list[_Node]):
        self.children = sorted(children, key=lambda c: c.weight())

    def weight(self) -> float:
        return self.children[0].weight()

    def collect_terms(self, out: list[str]) -> None:
        for c in self.children:
            c.collect_terms(out)

    def advance_phase(self, min_weight: float) -> bool:
        changed = False
        for c in self.children:
            changed |= c.advance_phase(min_weight)
        if changed:
            self.children.sort(key=lambda c: c.weight())
        return changed


def _conjunction(children: list[_Node]) -> _Node:
    # QueryTree.conjunction (QueryTree.java:150-166): singleton unwraps;
    # if EVERY child is an ANY node, return the first one.
    if not children:
        raise ValueError("Cannot build a conjunction with no children")
    if len(children) == 1:
        return children[0]
    if all(c.weight() <= 0 for c in children):
        return children[0]
    return _ConjNode(children)


def _disjunction(children: list[_Node]) -> _Node:
    # QueryTree.disjunction (QueryTree.java:173-185): any ANY child
    # swallows the whole disjunction.
    if not children:
        raise ValueError("Cannot build a disjunction with no children")
    if len(children) == 1:
        return children[0]
    for c in children:
        if c.weight() == 0:
            return c
    return _DisjNode(children)


# --------------------------------------------------------------------------
# QueryAnalyzer (QueryAnalyzer.java) over the local IR
# --------------------------------------------------------------------------


def build_tree(q: ir.Query, weightor: Callable[[str], float]) -> _Node:
    """Mirror of QueryAnalyzer.buildTree's QueryVisitor walk: each IR
    node maps to the tree its Lucene twin produces through
    ``Query.visit`` (citations inline)."""

    def term(t: str) -> _Node:
        return _TermNode(t, weightor(t))

    def build(q: ir.Query) -> _Node:
        if isinstance(q, ir.TermQuery):
            return term(q.term)  # TermQuery.visit → consumeTerms
        if isinstance(q, (ir.BoostQuery, ir.ConstantScoreQuery)):
            return build(q.query)  # visit() descends through wrappers
        if isinstance(q, ir.BooleanQuery):
            return _boolean_tree(q)
        if isinstance(q, (ir.PhraseQuery, ir.NGramPhraseQuery)):
            # PhraseQuery.visit consumes every term at the current level
            # → conjunction of the phrase's terms
            return _conjunction([term(t) for t in dict.fromkeys(q.terms)])
        if isinstance(q, ir.MultiPhraseQuery):
            # MultiPhraseQuery.java:204-213 — conjunction of per-slot
            # SHOULD groups
            return _conjunction(
                [_disjunction([term(t) for t in g]) for g in q.term_groups]
            )
        if isinstance(q, (ir.SynonymQuery, ir.BlendedTermQuery)):
            # SHOULD sub-visitor → disjunction of the variants
            return _disjunction([term(t) for t in q.terms])
        if isinstance(q, ir.DisjunctionMaxQuery):
            return _disjunction([build(s) for s in q.queries])
        if isinstance(q, ir.TermInSetQuery):
            # TermInSetQuery.java:131-141: one term → consumeTerms; more
            # → consumeTermsMatching, which QueryAnalyzer does not
            # override → visitLeaf → ANYTOKEN
            if len(q.terms) == 1:
                return term(q.terms[0])
            return _AnyNode(f"TermInSet[{len(q.terms)}]")
        if isinstance(q, ir.SpanTermQuery):
            return term(q.term)
        if isinstance(q, (ir.SpanNearQuery,)):
            return _conjunction([term(t) for t in dict.fromkeys(q.terms)])
        if isinstance(q, ir.SpanNearClauseQuery):
            return _conjunction([build(c) for c in q.clauses])
        if isinstance(q, ir.SpanOrQuery):
            return _disjunction([build(c) for c in q.clauses])
        if isinstance(q, ir.SpanNotQuery):
            return build(q.include)  # exclusions are never indexed
        if isinstance(q, (ir.SpanWithinQuery, ir.SpanContainingQuery)):
            # SpanContainQuery.visit: both big and little must match
            return _conjunction([build(q.big), build(q.little)])
        if isinstance(q, ir.SpanNotWithinQuery):
            return build(q.little)  # the excluder need not match
        if isinstance(q, ir.SpanNotContainingQuery):
            return build(q.minuend)
        if isinstance(q, ir.SpanFirstQuery):
            return build(q.match)
        if isinstance(q, ir.MatchNoDocsQuery):
            # matches nothing; ANYTOKEN keeps it sound (verify rejects)
            return _AnyNode("MatchNoDocs")
        # automata / dictionary-expansion leaves (Prefix/Wildcard/Regexp/
        # Fuzzy/TermRange/SpanMultiTermWrapper), MatchAll, and anything
        # else: QueryVisitor.visitLeaf → anyTerm (QueryAnalyzer.java:124-133)
        return _AnyNode(type(q).__name__)

    def _boolean_tree(bq: ir.BooleanQuery) -> _Node:
        # BooleanQuery.visit (BooleanQuery.java:511-527) through
        # QueryAnalyzer.QueryBuilder.getSubVisitor (QueryAnalyzer.java:76-114):
        # MUST/FILTER children conjoin; SHOULD children form one
        # disjunction, IGNORED when required clauses exist; MUST_NOT is
        # dropped except a pure-negative query → ANYTOKEN.
        musts = [c.query for c in bq.clauses if c.occur in (ir.Occur.MUST, ir.Occur.FILTER)]
        shoulds = [c.query for c in bq.clauses if c.occur == ir.Occur.SHOULD]
        nots = [c.query for c in bq.clauses if c.occur == ir.Occur.MUST_NOT]
        children: list[_Node] = [build(m) for m in musts]
        if shoulds and not musts:
            children.append(_disjunction([build(s) for s in shoulds]))
        if nots and not musts and not shoulds:
            children.append(_AnyNode("PURE NEGATIVE QUERY"))
        if not children:
            return _AnyNode("EMPTY BOOLEAN")
        return _conjunction(children)

    return build(q)


# --------------------------------------------------------------------------
# QueryDecomposer (QueryDecomposer.java)
# --------------------------------------------------------------------------


def decompose(q: ir.Query) -> list[ir.Query]:
    """QueryDecomposer.decompose (QueryDecomposer.java:40-118) — split
    top-level disjunctions so each part is presearched and verified
    independently; order-preserving where the Java uses Sets."""
    if isinstance(q, ir.BooleanQuery):
        return _decompose_boolean(q)
    if isinstance(q, ir.DisjunctionMaxQuery):
        out: list[ir.Query] = []
        for sub in q.queries:
            out.extend(decompose(sub))
        return _dedup(out)
    if isinstance(q, ir.BoostQuery):
        if q.boost == 1.0:
            return decompose(q.query)
        return _dedup([ir.BoostQuery(s, q.boost) for s in decompose(q.query)])
    return [q]


def _decompose_boolean(q: ir.BooleanQuery) -> list[ir.Query]:
    if q.min_should_match > 1:
        return [q]
    subqueries: list[ir.Query] = []
    exclusions: list[ir.Query] = []
    mandatory: list[ir.Query] = []
    for c in q.clauses:
        if c.occur in (ir.Occur.MUST, ir.Occur.FILTER):
            mandatory.append(c.query)
        elif c.occur == ir.Occur.MUST_NOT:
            exclusions.append(c.query)
        else:
            subqueries.extend(decompose(c.query))
    # more than one MUST, or MUST mixed with SHOULDs → indivisible
    if len(mandatory) > 1 or (len(mandatory) == 1 and subqueries):
        return [q]
    if len(mandatory) == 1:
        subqueries.extend(decompose(mandatory[0]))
    if not exclusions:
        return _dedup(subqueries)
    rewritten = [
        ir.BooleanQuery(
            (ir.BooleanClause(ir.Occur.MUST, s),)
            + tuple(ir.BooleanClause(ir.Occur.MUST_NOT, e) for e in exclusions)
        )
        for s in subqueries
    ]
    return _dedup(rewritten)


def _dedup(qs: Iterable[ir.Query]) -> list[ir.Query]:
    seen: set = set()
    out = []
    for q in qs:
        if q not in seen:
            seen.add(q)
            out.append(q)
    return out


# --------------------------------------------------------------------------
# Monitor
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class MonitorQuery:
    """MonitorQuery.java — an identified registered query."""

    query_id: str
    query: ir.Query


class Monitor:
    """Driver-side registration + distributed matching.

    ``passes`` > 1 selects MultipassTermFilteredPresearcher semantics:
    pass *p* stores the anchor terms of the (p+1)-th-heaviest tree path
    and candidates must hit every pass (MultipassTermFilteredPresearcher
    .java:37-51, min_weight :51-57).
    """

    def __init__(
        self,
        queries: Iterable[MonitorQuery] | dict[str, ir.Query],
        *,
        weightor: Callable[[str], float] = DEFAULT_WEIGHTOR,
        passes: int = 1,
        min_weight: float = 0.0,
        analyzer_kwargs: dict | None = None,
    ) -> None:
        if isinstance(queries, dict):
            queries = [MonitorQuery(k, v) for k, v in queries.items()]
        self.queries = list(queries)
        if len({m.query_id for m in self.queries}) != len(self.queries):
            raise ValueError("duplicate query_id in monitor registration")
        self.passes = int(passes)
        self.analyzer_kwargs = dict(analyzer_kwargs or {})
        # presearch tokenizes via postings_frame, verify via the batch
        # kernel — accept only kwargs BOTH understand, and fail at
        # registration instead of inside an executor task
        if self.analyzer_kwargs:
            import inspect

            from ..functions.analysis import postings_frame
            from ..functions.fast_tokenizer import batch_tokenize

            allowed = (
                set(inspect.signature(batch_tokenize).parameters)
                & set(inspect.signature(postings_frame).parameters)
            )
            bad = sorted(set(self.analyzer_kwargs) - allowed)
            if bad:
                raise ValueError(
                    f"unsupported monitor analyzer kwargs: {bad} "
                    f"(both tokenize paths must accept them)"
                )
        # registration: decompose → per-subquery anchor rows
        self.subqueries: dict[tuple[str, int], ir.Query] = {}
        rows: list[tuple[str, int, int, str]] = []  # (qid, sub, pass, term)
        for mq in self.queries:
            for sub_ord, sub in enumerate(decompose(mq.query)):
                self.subqueries[(mq.query_id, sub_ord)] = sub
                tree = build_tree(sub, weightor)
                for p in range(self.passes):
                    terms: list[str] = []
                    tree.collect_terms(terms)
                    for t in dict.fromkeys(terms):
                        rows.append((mq.query_id, sub_ord, p, t))
                    if p + 1 < self.passes:
                        tree.advance_phase(min_weight)
        self._anchor_rows = rows

    # ---- presearcher -----------------------------------------------------

    def anchor_frame(self, spark: SparkSession) -> DataFrame:
        """The query-index side of the presearch join."""
        schema = StructType(
            [
                StructField("query_id", StringType(), False),
                StructField("sub_ord", LongType(), False),
                StructField("pass", LongType(), False),
                StructField("term", StringType(), False),
            ]
        )
        return spark.createDataFrame(self._anchor_rows, schema)

    def presearch(
        self,
        docs: DataFrame,
        *,
        doc_id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Candidate ``(doc_id, query_id, sub_ord)`` pairs — a SUPERSET of
        the true matches (TermFilteredPresearcher.buildQuery): one
        broadcast hash join between distinct doc terms and anchor terms,
        plus the ANYTOKEN cross-attach; multipass requires a hit in every
        pass (candidate iff #distinct matched passes == passes)."""
        from ..functions.analysis import postings_frame

        spark = docs.sparkSession
        anchors = self.anchor_frame(spark)
        real = anchors.filter(F.col("term") != ANYTOKEN)
        anyq = (
            anchors.filter(F.col("term") == ANYTOKEN)
            .select("query_id", "sub_ord")
            .distinct()
        )
        doc_terms = (
            postings_frame(
                docs,
                text_col=text_col,
                id_col=doc_id_col,
                with_positions=False,
                **self.analyzer_kwargs,
            )
            .select(F.col("doc_id"), F.col("term"))
        )
        hits = doc_terms.join(F.broadcast(real), "term").select(
            "doc_id", "query_id", "sub_ord", "pass"
        )
        # every pass must be hit (single-pass degenerates to distinct)
        cands = (
            hits.groupBy("doc_id", "query_id", "sub_ord")
            .agg(F.countDistinct("pass").alias("np"))
            .filter(F.col("np") == F.lit(self.passes))
            .drop("np")
        )
        any_cands = (
            docs.select(F.col(doc_id_col).alias("doc_id"))
            .distinct()
            .crossJoin(F.broadcast(anyq))
        )
        return cands.unionByName(any_cands)

    # ---- matcher ---------------------------------------------------------

    def match(
        self,
        docs: DataFrame,
        *,
        doc_id_col: str = "doc_id",
        text_col: str = "text",
        mode: str = "match",  # "match" | "scoring"
    ) -> DataFrame:
        """Confirmed matches.

        ``match`` → (doc_id, query_id); ``scoring`` → + double ``score``
        computed against the single-document index (``DocumentBatch.of``
        — df=1, docCount=1, avgdl = the doc's own length), parts of a
        decomposed query summed and score≤0 dropped
        (ScoringMatch.java:36-45).
        """
        if mode not in ("match", "scoring", "highlights"):
            raise ValueError(f"bad mode {mode!r}")
        spark = docs.sparkSession
        cands = self.presearch(docs, doc_id_col=doc_id_col, text_col=text_col)
        cand_lists = cands.groupBy("doc_id").agg(
            F.collect_set(F.struct("query_id", "sub_ord")).alias("cands")
        )
        payload = docs.select(
            F.col(doc_id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).join(cand_lists, "doc_id")

        subq_bc = spark.sparkContext.broadcast(pickle.dumps(self.subqueries))
        ana_kwargs = dict(self.analyzer_kwargs)
        scoring = mode == "scoring"

        highlights = mode == "highlights"
        out_fields = [
            StructField("doc_id", LongType(), False),
            StructField("query_id", StringType(), False),
        ]
        if scoring:
            out_fields.append(StructField("score", DoubleType(), False))
        if highlights:
            # one row per hit span (end exclusive) — HighlightsMatch.Hit
            out_fields.append(StructField("start_pos", LongType(), False))
            out_fields.append(StructField("end_pos", LongType(), False))
        out_schema = StructType(out_fields)

        def verify(batches):
            import numpy as np
            import pandas as pd

            from ..functions.fast_tokenizer import batch_tokenize
            from ..oracle.engine import OracleIndex

            subqueries = pickle.loads(subq_bc.value)
            for pdf in batches:
                # ONE batch-kernel tokenize pass for the whole Arrow
                # batch (the per-doc scalar analyzer was the hot spot)
                tdoc, terms, pos = batch_tokenize(
                    pdf["text"].tolist(), **ana_kwargs
                )
                doc_ids = pdf["doc_id"].to_numpy(np.int64)
                cands = [
                    [(c["query_id"], int(c["sub_ord"])) for c in cand]
                    for cand in pdf["cands"]
                ]
                rows: list[tuple] = []
                if highlights:
                    tdoc = np.asarray(tdoc, np.int64)
                    terms_py = (
                        terms.to_pylist()
                        if hasattr(terms, "to_pylist")
                        else list(terms)
                    )
                    bounds = np.searchsorted(tdoc, np.arange(len(pdf) + 1))
                    for i, (did, cl) in enumerate(zip(doc_ids, cands)):
                        did = int(did)
                        toks = list(
                            zip(
                                terms_py[bounds[i] : bounds[i + 1]],
                                [
                                    int(p)
                                    for p in pos[bounds[i] : bounds[i + 1]]
                                ],
                            )
                        )
                        ix = OracleIndex([(0, toks)], pre_tokenized=True)
                        per_q: dict[str, set] = {}
                        for qid, sub_ord in cl:
                            h = match_hits(subqueries[(qid, sub_ord)], ix)
                            if h is None:
                                continue
                            per_q.setdefault(qid, set()).update(h)
                        for qid in sorted(per_q):
                            rows.extend(
                                (did, qid, sp, ep)
                                for sp, ep in sorted(per_q[qid])
                            )
                elif not scoring:
                    # match mode is stats-independent: ONE vectorized
                    # index over the batch (DocumentBatch role), each
                    # distinct candidate subquery evaluated once,
                    # intersected with its candidate docs
                    ix = OracleIndex.from_flat(doc_ids, tdoc, terms, pos)
                    distinct = sorted({key for cl in cands for key in cl})
                    matched = {
                        key: set(ix.matches(subqueries[key]))
                        for key in distinct
                    }
                    for did, cl in zip(doc_ids, cands):
                        did = int(did)
                        hit = sorted(
                            {q for (q, so) in cl if did in matched[(q, so)]}
                        )
                        rows.extend((did, qid) for qid in hit)
                else:
                    tdoc = np.asarray(tdoc, np.int64)
                    terms_py = (
                        terms.to_pylist()
                        if hasattr(terms, "to_pylist")
                        else list(terms)
                    )
                    bounds = np.searchsorted(
                        tdoc, np.arange(len(pdf) + 1)
                    )
                    for i, (did, cl) in enumerate(zip(doc_ids, cands)):
                        did = int(did)
                        toks = list(
                            zip(
                                terms_py[bounds[i] : bounds[i + 1]],
                                [
                                    int(p)
                                    for p in pos[bounds[i] : bounds[i + 1]]
                                ],
                            )
                        )
                        ix = OracleIndex([(0, toks)], pre_tokenized=True)
                        per_q: dict[str, float] = {}
                        for qid, sub_ord in cl:
                            sub = subqueries[(qid, sub_ord)]
                            if 0 not in ix.matches(sub):
                                continue
                            sc = _score_double_one_doc(sub, ix)
                            per_q[qid] = per_q.get(qid, 0.0) + sc
                        rows.extend(
                            (did, qid, s)
                            for qid, s in sorted(per_q.items())
                            if s > 0.0
                        )
                yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

        return payload.mapInPandas(verify, schema=out_schema)


def _score_double_one_doc(q: ir.Query, ix, boost: float = 1.0) -> float:
    """Double-precision BM25 over the single-doc index — the engine's
    double mode (DFExecutor._score_double_col twin): w − w/(1 + tf·inv),
    w = boost·ln(1 + (N−df+0.5)/(df+0.5)); N = 1, df = 1, avgdl = exact
    length, declen = SmallFloat-decoded norm byte."""
    from ..oracle import smallfloat

    k1, b = ix.k1, ix.b
    sum_ttf = ix.sum_ttf
    n_docs = ix.doc_count
    avgdl = sum_ttf / n_docs if n_docs else 1.0
    declen = float(smallfloat.byte4_to_int(ix.norms[0]))
    inv = 1.0 / (k1 * ((1.0 - b) + b * declen / avgdl))

    def w(df: int, bst: float) -> float:
        return bst * math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def tf_of(term: str) -> int:
        return ix.postings.get(term, {}).get(0, 0)

    def score(q: ir.Query, bst: float) -> float:
        if isinstance(q, ir.TermQuery):
            tf = tf_of(q.term)
            if tf == 0:
                return 0.0
            ww = w(ix.df(q.term), bst)
            return ww - ww / (1.0 + tf * inv)
        if isinstance(q, ir.BoostQuery):
            return score(q.query, bst * q.boost)
        if isinstance(q, ir.ConstantScoreQuery):
            return bst if 0 in ix.matches(q.query) else 0.0
        if isinstance(q, ir.SynonymQuery):
            tf = sum(tf_of(t) for t in q.terms)
            if tf == 0:
                return 0.0
            df = max(ix.df(t) for t in q.terms)
            ww = w(df, bst)
            return ww - ww / (1.0 + tf * inv)
        if isinstance(q, (ir.PhraseQuery,)):
            if any(ix.df(t) == 0 for t in q.terms):
                return 0.0
            if q.slop == 0:
                freq = float(ix._phrase_freq(q, 0))
            else:
                # sloppy matches carry the SloppyPhraseMatcher float freq
                from ..oracle.sloppy import sloppy_phrase_freq

                freq = sloppy_phrase_freq(
                    [ix.positions[t][0] for t in q.terms],
                    list(q.positions),
                    q.slop,
                    terms=list(q.terms),
                )
            if freq <= 0:
                return 0.0
            ww = sum(w(ix.df(t), bst) for t in q.terms)
            return ww - ww / (1.0 + freq * inv)
        if isinstance(q, ir.DisjunctionMaxQuery):
            scores = [score(s, bst) for s in q.queries]
            mx = max(scores) if scores else 0.0
            return mx + (sum(scores) - mx) * q.tie_breaker
        if isinstance(q, ir.BooleanQuery):
            total = 0.0
            for c in q.clauses:
                if c.occur == ir.Occur.MUST_NOT:
                    continue
                if c.occur == ir.Occur.FILTER:
                    continue
                s = score(c.query, bst)
                if c.occur == ir.Occur.MUST:
                    total += s
                elif c.occur == ir.Occur.SHOULD:
                    # only count SHOULDs the doc actually matches
                    if 0 in ix.matches(c.query):
                        total += s
            return total
        if isinstance(q, ir.TermInSetQuery):
            return bst if 0 in ix.matches(q) else 0.0
        if isinstance(q, ir.MatchAllDocsQuery):
            return bst
        # fall back to the float32 oracle score for exotic leaves —
        # membership identical, magnitude pinned by tests not SQL
        res = ix.matches(q, boost=bst)
        return float(res.get(0, 0.0))

    return score(q, boost)


def match_hits(q: ir.Query, ix) -> list[tuple[int, int]] | None:
    """HighlightsMatch role (``monitor/HighlightsMatch.java``): the hit
    spans ``(start_pos, end_pos)`` of ``q`` in the single-doc index
    ``ix`` (end exclusive), or None when the doc does not match.  Term /
    multi-term / synonym leaves yield their occurrences, exact phrases
    their alignments, the span algebra its enumerated spans, booleans
    the union over their matching positive clauses (the reference's
    Matches union); sloppy phrases are not supported (honest reject —
    their matcher reports frequency, not spans, in this engine)."""

    def spans_of(node: ir.Query) -> list[tuple[int, int]]:
        from ..oracle.spans import eval_spans
        from ..plans.span_rewrite import expand_span_wrappers

        node = expand_span_wrappers(node, ix.expand_multiterm)
        term_pos = {
            t: ix.positions[t][0]
            for t in _span_terms(node)
            if 0 in ix.positions.get(t, {})
        }
        return [(s, e) for s, e, _w in eval_spans(node, term_pos)]

    def hits(node: ir.Query) -> list[tuple[int, int]]:
        if isinstance(node, ir.TermQuery):
            return [
                (p, p + 1) for p in ix.positions.get(node.term, {}).get(0, [])
            ]
        if isinstance(node, (ir.SynonymQuery, ir.TermInSetQuery)):
            out = []
            for t in node.terms:
                out.extend(
                    (p, p + 1) for p in ix.positions.get(t, {}).get(0, [])
                )
            return sorted(set(out))
        if isinstance(node, (ir.PrefixQuery, ir.WildcardQuery,
                             ir.FuzzyQuery, ir.TermRangeQuery)):
            out = []
            for t in ix.expand_multiterm(node):
                out.extend(
                    (p, p + 1) for p in ix.positions.get(t, {}).get(0, [])
                )
            return sorted(set(out))
        if isinstance(node, ir.PhraseQuery):
            if node.slop != 0:
                raise NotImplementedError(
                    "sloppy-phrase highlight hits are not supported"
                )
            plists = [
                set(ix.positions.get(t, {}).get(0, []))
                for t in node.terms
            ]
            base = node.positions[0]
            width = max(node.positions) - base + 1
            out = []
            for p0 in sorted(plists[0]):
                if all(
                    (p0 - base + off) in plists[i]
                    for i, off in enumerate(node.positions)
                ):
                    out.append((p0, p0 + width))
            return out
        if isinstance(node, (ir.SpanNearQuery, ir.SpanNearClauseQuery,
                             ir.SpanTermQuery, ir.SpanOrQuery,
                             ir.SpanNotQuery, ir.SpanWithinQuery,
                             ir.SpanContainingQuery, ir.SpanFirstQuery,
                             ir.SpanNotContainingQuery,
                             ir.SpanNotWithinQuery)):
            if isinstance(node, ir.SpanNearQuery):
                node = ir.SpanNearClauseQuery(
                    tuple(ir.SpanTermQuery(t) for t in node.terms),
                    node.slop,
                    node.in_order,
                )
            return spans_of(node)
        if isinstance(node, (ir.BoostQuery, ir.ConstantScoreQuery)):
            return hits(node.query)
        if isinstance(node, ir.BooleanQuery):
            out: list[tuple[int, int]] = []
            for c in node.clauses:
                if c.occur == ir.Occur.MUST_NOT:
                    continue
                if 0 in ix.matches(c.query):
                    out.extend(hits(c.query))
            return sorted(set(out))
        raise NotImplementedError(
            f"highlight hits for {type(node).__name__}"
        )

    if 0 not in ix.matches(q):
        return None
    return sorted(set(hits(q)))


def _span_terms(node: ir.Query) -> set[str]:
    if isinstance(node, ir.SpanTermQuery):
        return {node.term}
    out: set[str] = set()
    for attr in ("clauses", "include", "exclude", "big", "little",
                 "minuend", "subtrahend", "match"):
        v = getattr(node, attr, None)
        if v is None:
            continue
        if isinstance(v, tuple):
            for c in v:
                out |= _span_terms(c)
        else:
            out |= _span_terms(v)
    if isinstance(node, ir.SpanNearQuery):
        out |= set(node.terms)
    return out
