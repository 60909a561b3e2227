"""Sandbox + memory surfaces: CoveringQuery, PhraseWildcardQuery,
MemoryIndex facade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.plans import ir

_T = ir.TermQuery
_O = ir.Occur


@pytest.fixture(scope="module")
def ex(spark, tiny_corpus_rows):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id: long, text: string",
    )
    ix = build_index(docs, text_col="text", doc_id_col="doc_id").persist()
    return DFExecutor(ix, mode="double")


# ------------------------------------------------------------ CoveringQuery


def test_covering_query_counts_and_scores(ex, tiny_oracle):
    subs = (_T("table"), _T("scan"), _T("merge"))
    q = ir.CoveringQuery(subs, "1 + doc_id % 3")
    got = {r.doc_id: r.score for r in ex.matches(q).collect()}
    # brute force: per doc, count/sum matching subqueries, threshold
    want = {}
    per = [tiny_oracle.matches(s) for s in subs]
    for d in range(tiny_oracle.doc_count):
        hits = [p[d] for p in per if d in p]
        mm = max(1, 1 + d % 3)
        if len(hits) >= mm:
            want[d] = sum(float(h) for h in hits)
    assert set(got) == set(want)
    for d in got:
        # double-mode executor vs f32 oracle scores: compare loosely
        assert got[d] == pytest.approx(want[d], rel=1e-5)


def test_covering_min_clamps_to_one(ex):
    q0 = ir.CoveringQuery((_T("table"),), "0")  # <1 treated as 1
    q1 = ir.CoveringQuery((_T("table"),), "1")
    assert sorted(r.doc_id for r in ex.matches(q0).collect()) == sorted(
        r.doc_id for r in ex.matches(q1).collect()
    )


def test_covering_too_many_clauses():
    with pytest.raises(ir.TooManyClauses):
        ir.CoveringQuery(tuple(_T(f"t{i}") for i in range(1025)), "1")


# ------------------------------------------------------- PhraseWildcardQuery


def test_phrase_wildcard_lowers_to_multiphrase(ex):
    from lucene_solr_spark.functions.phrase_wildcard import (
        phrase_wildcard_query,
    )

    q = phrase_wildcard_query(ex.index, ["def", ir.PrefixQuery("k")])
    assert isinstance(q, ir.MultiPhraseQuery)
    assert q.term_groups[0] == ("def",)
    assert all(t.startswith("k") for t in q.term_groups[1])
    assert list(q.term_groups[1]) == sorted(q.term_groups[1])
    # match set equals the union-of-expansions phrase, brute force
    got = {r.doc_id for r in ex.matches(q).collect()}
    assert got  # the corpus has 'def kwargs' bigrams


def test_phrase_wildcard_empty_slot_and_budget(ex):
    from lucene_solr_spark.functions.phrase_wildcard import (
        phrase_wildcard_query,
    )

    q = phrase_wildcard_query(ex.index, ["table", ir.PrefixQuery("zzz")])
    assert isinstance(q, ir.MatchNoDocsQuery)
    with pytest.raises(ir.TooManyClauses):
        phrase_wildcard_query(
            ex.index, [ir.PrefixQuery("s")], max_expansions=1
        )


# ---------------------------------------------------------------- MemoryIndex


def test_memory_index_scores_like_single_doc_engine(tiny_corpus_rows):
    from lucene_solr_spark.operators.memory_index import MemoryIndex
    from lucene_solr_spark.oracle.engine import OracleIndex

    text = tiny_corpus_rows[0]["content"]
    mi = MemoryIndex()
    mi.add_field("body", text)
    oracle = OracleIndex([(0, text)])
    some_term = next(iter(oracle.postings))
    q = _T(some_term)
    assert mi.matches(q)
    assert mi.search(q) == float(oracle.matches(q)[0])
    assert mi.search(_T("zzznotthere")) == 0.0
    # phrases and booleans evaluate too
    bq = ir.BooleanQuery(
        (
            ir.BooleanClause(_O.MUST, _T(some_term)),
            ir.BooleanClause(_O.MUST_NOT, _T("zzznotthere")),
        )
    )
    assert mi.matches(bq)


def test_memory_index_field_routing():
    from lucene_solr_spark.operators.memory_index import MemoryIndex

    mi = MemoryIndex()
    mi.add_field("title", "alpha beta")
    mi.add_field("body", "gamma delta")
    assert mi.matches(_T("alpha", field="title"))
    assert not mi.matches(_T("gamma", field="title"))
    assert mi.matches(_T("gamma", field="body"))
    # default field = first added
    assert mi.matches(_T("alpha"))
    with pytest.raises(KeyError):
        mi.search(_T("x", field="nope"))
    mi.reset()
    with pytest.raises(ValueError):
        mi.search(_T("alpha"))


# ----------------------------------------------------------- CombinedField


@pytest.fixture(scope="module")
def mf_index(spark, tiny_corpus_rows):
    from lucene_solr_spark.operators.multi_field import (
        build_multi_field_index,
    )

    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id: long, text: string",
    ).withColumn("title", F.expr("substring(text, 1, 30)"))
    return build_multi_field_index(
        docs, {"text": {"col": "text"}, "title": {"col": "title"}},
        doc_id_col="doc_id",
    ).persist()


def test_combined_field_brute_force(spark, mf_index):
    import math

    import numpy as np

    from lucene_solr_spark.functions.combined_field import (
        combined_field_scores,
    )
    from lucene_solr_spark.oracle import bm25, smallfloat

    weights = {"text": 1.0, "title": 2.0}
    terms = ["def", "class"]
    got = {
        r.doc_id: r.score
        for r in combined_field_scores(mf_index, terms, weights).collect()
    }
    # scalar brute force from the per-field frames
    tf = {}
    for f, w in weights.items():
        for r in (
            mf_index.fields[f]
            .postings_slim.filter(F.col("term").isin(terms))
            .collect()
        ):
            tf[r.doc_id] = tf.get(r.doc_id, 0.0) + w * r.tf
    norms = {f: {r.doc_id: r.norm for r in mf_index.fields[f].norms.collect()} for f in weights}
    df_max = 0
    ttf = 0
    for t in terms:
        for f in sorted(weights):
            row = (
                mf_index.fields[f]
                .term_stats.filter(F.col("term") == t)
                .collect()
            )
            if row:
                df_max = max(df_max, row[0].df)
                ttf = int(ttf + weights[f] * row[0].ttf)
    doc_count = max(ix.doc_count for ix in mf_index.fields.values())
    sum_ttf = 0
    for f in sorted(weights):
        sum_ttf = int(sum_ttf + weights[f] * mf_index.fields[f].sum_ttf)
    avgdl = sum_ttf / doc_count
    wq = math.log(1.0 + (doc_count - df_max + 0.5) / (df_max + 0.5))
    want = {}
    for d, freq in tf.items():
        clen = math.floor(
            float(
                np.float32(
                    sum(
                        weights[f]
                        * float(bm25.LENGTH_TABLE_F32[norms[f][d]])
                        for f in weights
                    )
                )
            )
            + 0.5
        )
        declen = float(bm25.LENGTH_TABLE_F32[smallfloat.int_to_byte4(int(clen))])
        inv = 1.0 / (1.2 * (0.25 + (0.75 * declen) / avgdl))
        want[d] = wq - wq / (1.0 + freq * inv)
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-12), d


def test_combined_field_weight_validation(mf_index):
    from lucene_solr_spark.functions.combined_field import (
        combined_field_scores,
    )

    with pytest.raises(ValueError):
        combined_field_scores(mf_index, ["def"], {"text": 0.5})


def test_covering_null_source_never_matches(ex):
    q = ir.CoveringQuery(
        (_T("table"),),
        "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE NULL END",
    )
    got = {r.doc_id for r in ex.matches(q).collect()}
    base = {r.doc_id for r in ex.matches(_T("table")).collect()}
    assert got == {d for d in base if d % 2 == 0}
    assert not any(d % 2 for d in got)
