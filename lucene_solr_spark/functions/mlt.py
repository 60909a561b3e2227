"""MoreLikeThis and CommonTermsQuery — query-construction operators from
the reference's lucene/queries module, re-expressed over the Spark index.

MoreLikeThis (queries/mlt/MoreLikeThis.java:553-560, 591-616, 622-674):
pick the source doc's "interesting terms" by tf·idf against the existing
dictionary, then build a SHOULD disjunction (optionally per-term boosted
by ``boostFactor * score / bestScore``).  The idf is ClassicSimilarity's
``log((docCount+1)/(docFreq+1)) + 1`` (similarities/ClassicSimilarity.java:60-64),
and candidate terms are filtered by minTermFreq / minDocFreq / maxDocFreq /
word-length bounds exactly as createQueue does.

CommonTermsQuery (queries/CommonTermsQuery.java:143-203): split query
terms into low/high-frequency groups at
``df > ceil(maxTermFrequency * maxDoc)`` (or an absolute cutoff when
``maxTermFrequency >= 1``), then combine
``MUST(Boost(lowFreqBool)) + SHOULD(Boost(highFreqBool))``; when no
low-frequency term exists the high group hardens to a MUST conjunction
(reference lines 172-180).  Both operators REWRITE into the engine's
standard IR, so they execute through either executor unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.oracle import bm25
from lucene_solr_spark.plans import ir

__all__ = [
    "interesting_terms",
    "mlt_query",
    "mlt_topk",
    "common_terms_query",
]


def interesting_terms(
    index,
    doc_id: int,
    *,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    max_doc_freq: int | None = None,
    max_query_terms: int = 25,
    min_word_len: int = 0,
    max_word_len: int = 0,
    stopwords: frozenset[str] = frozenset(),
) -> list[tuple[str, float, int, int]]:
    """Top tf·idf terms of one document: ``[(term, score, tf, df), ...]``.

    The source doc's term freqs come from the index's own postings (the
    reference reads them from the term vector / re-analysis —
    MoreLikeThis.java:760-800; the inverted index stores the same tf), and
    the df lookup is one pruned dictionary join.  Only ONE doc's dictionary
    ever reaches the driver.  Ties order by (score desc, term asc) — the
    reference's priority queue leaves ties unspecified, so we pin a total
    order to make results deterministic.
    """
    src = index.postings_slim.filter(F.col("doc_id") == int(doc_id)).select(
        "term", "tf"
    )
    cand = src.join(index.term_stats.select("term", "df"), "term").collect()
    n = index.doc_count
    out: list[tuple[str, float, int, int]] = []
    for r in cand:
        term, tf, df = r["term"], int(r["tf"]), int(r["df"])
        if min_term_freq > 0 and tf < min_term_freq:
            continue
        if min_doc_freq > 0 and df < min_doc_freq:
            continue
        if max_doc_freq is not None and df > max_doc_freq:
            continue
        if min_word_len > 0 and len(term) < min_word_len:
            continue
        if max_word_len > 0 and len(term) > max_word_len:
            continue
        if df == 0 or term in stopwords:
            continue
        idf = math.log((n + 1) / (df + 1.0)) + 1.0
        out.append((term, tf * idf, tf, df))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:max_query_terms]


def mlt_query(
    index,
    doc_id: int,
    *,
    boost: bool = False,
    boost_factor: float = 1.0,
    **kw,
) -> ir.Query:
    """Build the MoreLikeThis query (SHOULD disjunction of interesting
    terms; per-term BoostQuery when ``boost`` — MoreLikeThis.java:591-616)."""
    sel = interesting_terms(index, doc_id, **kw)
    if not sel:
        return ir.MatchNoDocsQuery()
    best = sel[0][1]
    clauses = []
    for term, score, _tf, _df in sel:
        q: ir.Query = ir.TermQuery(term)
        if boost:
            q = ir.BoostQuery(q, boost_factor * score / best)
        clauses.append(ir.BooleanClause(ir.Occur.SHOULD, q))
    return ir.BooleanQuery(tuple(clauses), 0)


def mlt_topk(
    executor,
    doc_id: int,
    k: int = 10,
    *,
    boost: bool = False,
    boost_factor: float = 1.0,
    **kw,
) -> DataFrame:
    """MoreLikeThis top-k through a SINGLE pruned postings scan.

    Instead of |terms| scans + union (what the generic boolean evaluator
    would do for a 25-clause disjunction), score every matching posting in
    one pass: filter the slim postings to the selected terms, join norms
    once, look the per-term weight up in a broadcast literal map, and
    groupBy-sum.  Leaf scores round to float32 before accumulating in
    double — Scorer.score() returns float in the reference
    (search/Scorer.java) and the disjunction accumulates in double
    (DisjunctionSumScorer.java:42-47); since float32 values carry 24-bit
    mantissas and BM25 magnitudes are within 2^29 of each other, the
    double sum is EXACT and therefore order-independent — safe under
    distributed aggregation and hash-identical to the SQL oracle.
    """
    ix = executor.index
    sel = interesting_terms(ix, doc_id, **kw)
    if not sel:
        spark = ix.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")
    terms = [t for t, _s, _tf, _df in sel]
    for t in terms:
        executor._df(t)
    # per-term boost = boostFactor · score/bestScore when enabled
    # (MoreLikeThis.java:591-616 setBoost path — the KNN classifier's
    # default, KNearestNeighborClassifier.java:156 setBoost(true))
    best = sel[0][1]
    weights = {
        t: float(
            executor._term_weight(
                boost_factor * s / best if boost else 1.0,
                *executor._stats_cache[t],
            )
        )
        for t, s, _tf, _df in sel
    }
    rows = ix.postings_slim.filter(F.col("term").isin(terms)).join(
        executor._norms(), "doc_id"
    )
    wmap = F.create_map(
        *[x for t, w in weights.items() for x in (F.lit(t), F.lit(w))]
    )
    w = wmap[F.col("term")]
    lut = F.lit(bm25.LENGTH_TABLE_F32.astype(float).tolist())
    declen = F.element_at(lut, F.col("norm").cast("int") + 1)
    inv = F.lit(1.0) / (
        F.lit(float(executor.k1))
        * (
            F.lit(1.0 - executor.b)
            + F.lit(float(executor.b)) * declen / F.lit(executor._avgdl_double)
        )
    )
    leaf = w - w / (F.lit(1.0) + F.col("tf").cast("double") * inv)
    leaf_f32 = leaf.cast("float").cast("double")
    out = (
        rows.select("doc_id", leaf_f32.alias("s"))
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def common_terms_query(
    terms: tuple[str, ...],
    df_lookup,
    max_doc: int,
    *,
    max_term_frequency: float = 0.01,
    low_freq_occur: ir.Occur = ir.Occur.SHOULD,
    high_freq_occur: ir.Occur = ir.Occur.SHOULD,
    low_freq_boost: float = 1.0,
    high_freq_boost: float = 1.0,
    low_freq_min_should_match: float = 0.0,
    high_freq_min_should_match: float = 0.0,
) -> ir.Query:
    """CommonTermsQuery.buildQuery as an IR rewrite (CommonTermsQuery.java:143-203).

    ``df_lookup(term) -> int`` supplies docFreq (the role of
    collectTermStates); terms absent from the dictionary go to the
    low-frequency group exactly as termStates==null does (line 148-150).
    """
    if low_freq_occur == ir.Occur.MUST_NOT or high_freq_occur == ir.Occur.MUST_NOT:
        raise ValueError("occur must be MUST or SHOULD")

    cutoff = int(math.ceil(max_term_frequency * float(max_doc)))
    low: list[ir.Query] = []
    high: list[ir.Query] = []
    for t in terms:
        df = int(df_lookup(t))
        if df == 0:
            low.append(ir.TermQuery(t))
        elif (max_term_frequency >= 1.0 and df > max_term_frequency) or df > cutoff:
            high.append(ir.TermQuery(t))
        else:
            low.append(ir.TermQuery(t))

    def _msm(spec: float, n_opt: int) -> int:
        # CommonTermsQuery.java:136-141
        if spec >= 1.0 or spec == 0.0:
            return int(spec)
        return int(spec * n_opt + 0.5)  # Math.round

    low_msm = _msm(low_freq_min_should_match, len(low)) if (
        low_freq_occur == ir.Occur.SHOULD and low
    ) else 0
    high_msm = _msm(high_freq_min_should_match, len(high)) if (
        high_freq_occur == ir.Occur.SHOULD and high
    ) else 0

    if not low:
        # rewrite high-freq terms into a conjunction (lines 172-180)
        if high_msm == 0 and high_freq_occur != ir.Occur.MUST:
            high_freq_occur = ir.Occur.MUST
        hq = ir.BooleanQuery(
            tuple(ir.BooleanClause(high_freq_occur, q) for q in high), high_msm
        )
        return ir.BoostQuery(hq, high_freq_boost)

    clauses = [
        ir.BooleanClause(
            ir.Occur.MUST,
            ir.BoostQuery(
                ir.BooleanQuery(
                    tuple(ir.BooleanClause(low_freq_occur, q) for q in low),
                    low_msm,
                ),
                low_freq_boost,
            ),
        )
    ]
    if high:
        clauses.append(
            ir.BooleanClause(
                ir.Occur.SHOULD,
                ir.BoostQuery(
                    ir.BooleanQuery(
                        tuple(
                            ir.BooleanClause(high_freq_occur, q) for q in high
                        ),
                        high_msm,
                    ),
                    high_freq_boost,
                ),
            )
        )
    return ir.BooleanQuery(tuple(clauses), 0)
