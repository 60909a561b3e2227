"""Payload queries — the PayloadScoreQuery / PayloadFunction surface.

Re-expresses ``lucene/queries/src/java/org/apache/lucene/queries/
payloads/PayloadScoreQuery.java:43`` for the Spark engine, using the
repo's stored per-position offset streams as the payload store:

- In Lucene a payload is a per-position byte[] written at analysis time
  and read back by a ``PayloadDecoder`` while spans match. This engine's
  positional index (``index_options="offsets"``) already stores one
  per-position datum — the token's char span — so the built-in decoder
  derives ``payload(position) = end_offset − start_offset`` (the surface
  token length), the engine's analogue of Lucene's delimited-payload
  demos. Custom decoders plug in as a Spark SQL expression over
  ``(s, e, pos)``.
- PayloadFunction parity (``payloads/MinPayloadFunction.java`` /
  ``MaxPayloadFunction.java`` / ``AveragePayloadFunction.java`` /
  ``SumPayloadFunction.java``): the doc score aggregates the payloads at
  every MATCHED position across all of the doc's span matches
  (``PayloadFunction.currentScore``/``docScore`` contract), with
  ``includeSpanScore=false`` semantics — payload score alone
  (``PayloadScoreQuery.java:60``), the exactly-oracle-checkable form.

Scale shape: the term form is pure whole-stage-codegen relational work
(one postings scan filtered to the term — row-group pruned on the
term-sorted layout — one explode, one groupBy doc_id). The span-near
form reads ONLY the clause terms' postings and runs the shared span
kernel per doc in an Arrow batch pass; nothing ever scans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PAYLOAD_FUNCTIONS", "payload_score_term", "payload_score_near"]

#: PayloadFunction name → Spark aggregate (SumPayloadFunction et al.)
PAYLOAD_FUNCTIONS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
}

#: the built-in decoder: surface token length from the stored char span
SURFACE_LENGTH = "e - s"


def _require_offsets(index) -> None:
    for c in ("start_offsets", "end_offsets"):
        if c not in index.postings.columns:
            raise ValueError(
                "payload queries need stored per-position payloads; build "
                "the index with index_options='offsets'"
            )


def payload_score_term(
    index,
    term: str,
    fn: str = "sum",
    decoder: str = SURFACE_LENGTH,
) -> DataFrame:
    """PayloadScoreQuery over a SpanTermQuery: every occurrence of
    ``term`` is a matched position (``spans/SpanTermQuery.java``), so the
    doc score is ``fn`` over the decoded payloads of all occurrences.
    Returns (doc_id, score double)."""
    _require_offsets(index)
    if fn not in PAYLOAD_FUNCTIONS:
        raise ValueError(f"fn must be one of {sorted(PAYLOAD_FUNCTIONS)}, got {fn!r}")
    occ = (
        index.postings.filter(F.col("term") == term)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.col("positions").alias("pos"),
                    F.col("start_offsets").alias("s"),
                    F.col("end_offsets").alias("e"),
                )
            ).alias("z"),
        )
        .select(
            "doc_id",
            F.col("z.pos").alias("pos"),
            F.col("z.s").alias("s"),
            F.col("z.e").alias("e"),
        )
    )
    agg = PAYLOAD_FUNCTIONS[fn]
    return occ.groupBy("doc_id").agg(
        agg(F.expr(decoder).cast("double")).alias("score")
    )


def payload_score_near(
    index,
    terms: tuple[str, str],
    slop: int = 0,
    in_order: bool = True,
    fn: str = "sum",
    decoder: str = SURFACE_LENGTH,
) -> DataFrame:
    """PayloadScoreQuery over a two-clause SpanNearQuery: the engine's
    span matcher enumerates the doc's matched spans (the same
    ``near_spans`` kernel the scored span paths use), each span
    contributes the payloads at its two matched positions (first clause
    at ``span.start``, second at ``span.end − 1``), and ``fn``
    aggregates across all contributed payloads
    (``PayloadScoreQuery.java:43`` + the PayloadFunction contract).
    Returns (doc_id, score double)."""
    import pandas as pd

    _require_offsets(index)
    if fn not in PAYLOAD_FUNCTIONS:
        raise ValueError(f"fn must be one of {sorted(PAYLOAD_FUNCTIONS)}, got {fn!r}")
    if len(terms) != 2:
        raise ValueError("payload_score_near supports exactly two clauses")
    ta, tb = terms

    def side(t: str, tag: str) -> DataFrame:
        return index.postings.filter(F.col("term") == t).select(
            "doc_id",
            F.col("positions").alias(f"pos_{tag}"),
            F.col("start_offsets").alias(f"s_{tag}"),
            F.col("end_offsets").alias(f"e_{tag}"),
        )

    joined = side(ta, "a").join(side(tb, "b"), "doc_id")
    _slop, _ord = int(slop), bool(in_order)
    _fn = fn

    def run(batches):
        import numpy as np

        from lucene_solr_spark.oracle.spans import near_spans

        for pdf in batches:
            out_d, out_s = [], []
            for row in pdf.itertuples(index=False):
                pa_ = np.asarray(row.pos_a, np.int64)
                pb_ = np.asarray(row.pos_b, np.int64)
                spans = near_spans([pa_, pb_], _slop, _ord)
                if not spans:
                    continue
                len_at = {}
                for p, s, e in zip(row.pos_a, row.s_a, row.e_a):
                    len_at[int(p)] = int(e) - int(s)
                for p, s, e in zip(row.pos_b, row.s_b, row.e_b):
                    len_at[int(p)] = int(e) - int(s)
                payloads = []
                for start, end, _w in spans:
                    # positions [start, end): first clause at start, the
                    # other at the window's last position end-1
                    payloads.append(len_at[int(start)])
                    payloads.append(len_at[int(end) - 1])
                if _fn == "sum":
                    v = float(sum(payloads))
                elif _fn == "min":
                    v = float(min(payloads))
                elif _fn == "max":
                    v = float(max(payloads))
                else:
                    v = float(sum(payloads)) / len(payloads)
                out_d.append(row.doc_id)
                out_s.append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_d, dtype="int64"),
                    "score": pd.Series(out_s, dtype="float64"),
                }
            )

    return joined.mapInPandas(run, schema="doc_id long, score double")
