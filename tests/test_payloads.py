"""PayloadScoreQuery / PayloadFunction parity (queries/payloads/
PayloadScoreQuery.java:43): the built-in decoder derives the payload
from the stored per-position char span (surface token length); doc score
= PayloadFunction aggregate over payloads at every matched position,
includeSpanScore=false semantics."""

from __future__ import annotations

import pytest

from lucene_solr_spark.functions.payloads import (
    payload_score_near,
    payload_score_term,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ixoff(spark):
    from lucene_solr_spark.operators.index_build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return build_index(
        docs, text_col="text", doc_id_col="doc_id", index_options="offsets"
    ).persist()


def _manual_stream(spark):
    """(doc_id -> [(term, pos, s, e)]) via the analyzer with offsets —
    the independent recomputation payloads must agree with."""
    from lucene_solr_spark.functions.highlight import analyze_with_offsets

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    return {r["doc_id"]: analyze_with_offsets(r["text"]) for r in docs}


@pytest.mark.parametrize("fn", ["sum", "min", "max", "avg"])
def test_term_payload_matches_manual(spark, ixoff, fn):
    got = {
        r["doc_id"]: r["score"]
        for r in payload_score_term(ixoff, "merge", fn=fn).collect()
    }
    want = {}
    for did, toks in _manual_stream(spark).items():
        lens = [float(e - s) for t, _p, s, e in toks if t == "merge"]
        if not lens:
            continue
        want[did] = {
            "sum": sum(lens),
            "min": min(lens),
            "max": max(lens),
            "avg": sum(lens) / len(lens),
        }[fn]
    assert got == want and got


def test_near_payload_matches_manual(spark, ixoff):
    from lucene_solr_spark.oracle.spans import near_spans

    got = {
        r["doc_id"]: r["score"]
        for r in payload_score_near(
            ixoff, ("table", "scan"), slop=2, in_order=True, fn="sum"
        ).collect()
    }
    want = {}
    for did, toks in _manual_stream(spark).items():
        pos = {"table": [], "scan": []}
        len_at = {}
        for t, p, s, e in toks:
            if t in pos:
                pos[t].append(p)
                len_at[p] = e - s
        spans = near_spans([pos["table"], pos["scan"]], 2, True)
        if not spans:
            continue
        payloads = []
        for start, end, _w in spans:
            payloads.append(len_at[start])
            payloads.append(len_at[end - 1])
        want[did] = float(sum(payloads))
    assert got == want and got


def test_requires_offsets_index(spark):
    from lucene_solr_spark.operators.index_build import build_index

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ix = build_index(docs, text_col="text", doc_id_col="doc_id")
    with pytest.raises(ValueError, match="offsets"):
        payload_score_term(ix, "merge")


def test_bad_fn_rejected(ixoff):
    with pytest.raises(ValueError, match="fn must be"):
        payload_score_term(ixoff, "merge", fn="median")
    with pytest.raises(ValueError, match="two clauses"):
        payload_score_near(ixoff, ("a", "b", "c"), fn="sum")  # type: ignore[arg-type]
