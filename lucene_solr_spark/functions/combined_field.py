"""CombinedFieldQuery (``sandbox/search/CombinedFieldQuery.java``) —
BM25F's simple variant: multiple fields score as ONE synthetic field.

Reference semantics re-expressed (citations inline):

- pseudo TERM stats (:288-305): df = max over (term, field) pairs'
  docFreq; totalTermFreq accumulates ``(long)(run + weight·ttf)`` in
  (term, field) iteration order.
- pseudo COLLECTION stats (:317-335): docCount and sumDocFreq are
  maxima over the fields, sumTotalTermFreq accumulates weighted like
  the term ttf; avgdl of the synthetic field follows.
- per-doc freq: the disjunction of every (term, field) postings list
  with ``weight · tf`` contributions (WeightedDisiWrapper, :419-431);
  weighted small-int freqs are float-exact, so the double sum is
  order-independent.
- per-doc norm (MultiNormsLeafSimScorer.java:112-146): the fields'
  SmallFloat-decoded lengths combine as ``round(Σ weight·declen)`` and
  re-encode through intToByte4 — here a range join against the same
  norm lookup the SQL oracle uses, so both engines see identical
  quantized lengths.

The whole query is one union + one groupBy + two broadcast joins —
per-doc work never leaves the JVM.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..oracle import bm25 as _bm25

__all__ = ["combined_field_scores", "combined_field_topk"]


def _pseudo_stats(mf, terms, field_weights):
    """Driver-side pseudo term + collection statistics (small lookups —
    one pruned dictionary probe per (term, field))."""
    fields = sorted(field_weights)
    # ONE pruned dictionary probe per field (not per (term, field) pair)
    stats: dict[str, dict[str, tuple[int, int]]] = {}
    for f in fields:
        stats[f] = {
            r.term: (int(r.df), int(r.ttf))
            for r in mf.fields[f]
            .term_stats.filter(F.col("term").isin(list(terms)))
            .select("term", "df", "ttf")
            .collect()
        }
    df_max = 0
    ttf_run = 0
    for t in terms:
        for f in fields:
            df, ttf = stats[f].get(t, (0, 0))
            if df > 0:
                df_max = max(df_max, df)
                # Java: totalTermFreq += (double) weight * ttf (long
                # compound assignment truncates the running double)
                ttf_run = int(ttf_run + field_weights[f] * ttf)
    doc_count = 0
    sum_ttf_run = 0
    for f in fields:
        ix = mf.fields[f]
        doc_count = max(doc_count, int(ix.doc_count))
        sum_ttf_run = int(sum_ttf_run + field_weights[f] * int(ix.sum_ttf))
    return df_max, max(1, ttf_run), doc_count, sum_ttf_run


def combined_field_scores(
    mf,
    terms,
    field_weights: dict[str, float],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score) for every matching doc, double mode."""
    for w in field_weights.values():
        if w < 1:
            raise ValueError("weight must be greater or equal to 1")
    fields = sorted(field_weights)
    df_max, _ttf, doc_count, sum_ttf = _pseudo_stats(mf, terms, field_weights)
    spark = mf.fields[fields[0]].postings.sparkSession
    if df_max == 0:
        return spark.createDataFrame([], "doc_id long, score double")
    avgdl = sum_ttf / doc_count
    w_pseudo = math.log(1.0 + (doc_count - df_max + 0.5) / (df_max + 0.5))

    # per-doc combined freq: weighted postings union (float-exact)
    freq = None
    for f in fields:
        ix = mf.fields[f]
        part = ix.postings_slim.filter(F.col("term").isin(list(terms))).select(
            "doc_id",
            (F.col("tf").cast("double") * F.lit(float(field_weights[f])))
            .cast("float")
            .cast("double")
            .alias("wtf"),
        )
        freq = part if freq is None else freq.unionByName(part)
    freq = freq.groupBy("doc_id").agg(F.sum("wtf").alias("freq"))

    # per-doc combined norm: Σ w·declen, rounded, re-encoded via the
    # norm table (range join on [lo, hi))
    declen_lut = F.lit(_bm25.LENGTH_TABLE_F32.astype(float).tolist())
    comb = None
    for f in fields:
        part = mf.fields[f].norms.select(
            "doc_id",
            (
                F.element_at(declen_lut, F.col("norm").cast("int") + 1)
                * F.lit(float(field_weights[f]))
            )
            .cast("float")
            .cast("double")
            .alias("wlen"),
        )
        comb = part if comb is None else comb.unionByName(part)
    # Math.round(float) = floor(x + 0.5)
    lengths = comb.groupBy("doc_id").agg(
        F.floor(F.sum("wlen").cast("float") + F.lit(0.5))
        .cast("long")
        .alias("clen")
    )
    # same 256-bucket table the SQL oracle inlines (norm_lut_sql)
    lut_rows = [
        (
            b_,
            int(_bm25.LENGTH_TABLE[b_]),
            int(_bm25.LENGTH_TABLE[b_ + 1]) if b_ < 255 else 2**62,
            float(_bm25.LENGTH_TABLE_F32[b_]),
        )
        for b_ in range(256)
    ]
    lut = F.broadcast(
        spark.createDataFrame(
            lut_rows, "norm: int, lo: long, hi: long, declen: double"
        )
    )
    norms = lengths.join(
        lut,
        (F.col("clen") >= F.col("lo")) & (F.col("clen") < F.col("hi")),
    ).select("doc_id", "declen")

    inv = F.lit(1.0) / (
        F.lit(float(k1))
        * (F.lit(1.0 - b) + (F.lit(float(b)) * F.col("declen")) / F.lit(avgdl))
    )
    score = F.lit(w_pseudo) - F.lit(w_pseudo) / (
        F.lit(1.0) + F.col("freq") * inv
    )
    return (
        freq.join(norms, "doc_id")
        .select("doc_id", score.alias("score"))
    )


def combined_field_topk(mf, terms, field_weights, k: int = 10) -> DataFrame:
    return (
        combined_field_scores(mf, terms, field_weights)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )
