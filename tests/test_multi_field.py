"""Per-field indexing + field-qualified queries (operators.multi_field).

Reference surface: ``index/FieldInfos.java`` (per-field postings / norms /
stats), ``index/Term.java:36`` (a term is (field, text)),
``queryparser/.../classic/QueryParserBase.java:437`` (getFieldQuery).

Contract pinned here: a field-qualified leaf evaluated through the
MultiFieldExecutor is BIT-IDENTICAL to the same leaf run by a plain
DFExecutor over a single-field index built from that field's column —
delegation adds nothing and loses nothing — and cross-field booleans
combine those per-field scores on the shared doc_id space.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.plans import ir
from lucene_solr_spark.plans.parser import parse_query


@pytest.fixture(scope="module")
def mf_setup(spark, tiny_corpus_rows):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.multi_field import (
        MultiFieldExecutor,
        build_multi_field_index,
    )

    corpus = spark.createDataFrame(
        [
            (i, r["content"], " ".join(r["content"].split()[:3]))
            for i, r in enumerate(tiny_corpus_rows)
        ],
        "doc_id long, content string, title string",
    )
    mf = build_multi_field_index(
        corpus,
        {"content": {"col": "content"}, "title": {"col": "title"}},
        doc_id_col="doc_id",
    ).persist()
    # independent single-field builds over the same columns
    body_ix = build_index(corpus, text_col="content", doc_id_col="doc_id").persist()
    title_ix = build_index(corpus, text_col="title", doc_id_col="doc_id").persist()
    return mf, body_ix, title_ix


def _rows(df):
    return sorted((r["doc_id"], r["score"]) for r in df.collect())


# ------------------------------------------------------------------ parser
def test_parser_field_term():
    assert parse_query("title:merge") == ir.TermQuery("merge", field="title")


def test_parser_field_phrase():
    q = parse_query('title:"a b"~2')
    assert q == ir.PhraseQuery(("a", "b"), slop=2, field="title")


def test_parser_field_prefix_fuzzy_range():
    assert parse_query("title:mer*") == ir.PrefixQuery("mer", field="title")
    assert parse_query("title:merge~1") == ir.FuzzyQuery(
        "merge", max_edits=1, field="title"
    )
    assert parse_query("title:[a TO b]") == ir.TermRangeQuery(
        "a", "b", True, True, field="title"
    )


def test_parser_unfielded_unchanged():
    assert parse_query("merge") == ir.TermQuery("merge")


# ----------------------------------------------------- per-field semantics
def test_field_stats_differ(mf_setup):
    mf, _, _ = mf_setup
    body, title = mf.fields["content"], mf.fields["title"]
    assert body.sum_ttf > title.sum_ttf
    assert title.sum_ttf / title.doc_count < body.sum_ttf / body.doc_count


@pytest.mark.parametrize("mode", ["float32", "double"])
def test_field_leaf_identical_to_single_field_index(mf_setup, mode):
    from lucene_solr_spark.operators.multi_field import MultiFieldExecutor
    from lucene_solr_spark.plans.df_executor import DFExecutor

    mf, _, title_ix = mf_setup
    term = title_ix.term_stats.orderBy(F.desc("df"), F.asc("term")).first()["term"]
    mex = MultiFieldExecutor(mf, mode=mode)
    sex = DFExecutor(title_ix, mode=mode)
    got = _rows(mex.matches(ir.TermQuery(term, field="title")))
    want = _rows(sex.matches(ir.TermQuery(term)))
    assert got == want and got


@pytest.mark.parametrize("mode", ["float32", "double"])
def test_cross_field_req_opt(mf_setup, mode):
    """MUST body-term + SHOULD title-term == manual per-field combine."""
    from lucene_solr_spark.operators.multi_field import MultiFieldExecutor
    from lucene_solr_spark.plans.df_executor import DFExecutor

    mf, body_ix, title_ix = mf_setup
    bterm = body_ix.term_stats.orderBy(F.desc("df"), F.asc("term")).first()["term"]
    tterm = title_ix.term_stats.orderBy(F.asc("df"), F.asc("term")).first()["term"]
    mex = MultiFieldExecutor(mf, mode=mode)
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.MUST, ir.TermQuery(bterm)),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery(tterm, field="title")),
        )
    )
    got = dict(_rows(mex.matches(q)))

    breq = dict(_rows(DFExecutor(body_ix, mode=mode).matches(ir.TermQuery(bterm))))
    topt = dict(_rows(DFExecutor(title_ix, mode=mode).matches(ir.TermQuery(tterm))))
    import numpy as np

    want = {}
    for d, s in breq.items():
        if d in topt:
            if mode == "float32":
                want[d] = float(np.float32(np.float32(s) + np.float32(topt[d])))
            else:
                want[d] = s + topt[d]
        else:
            want[d] = s
    assert got == pytest.approx(want)
    assert set(got) == set(breq)  # SHOULD never widens a MUST


def test_default_field_explicit_equals_implicit(mf_setup):
    from lucene_solr_spark.operators.multi_field import MultiFieldExecutor

    mf, _, _ = mf_setup
    mex = MultiFieldExecutor(mf, mode="double")
    a = _rows(mex.matches(ir.TermQuery("the")))
    b = _rows(mex.matches(ir.TermQuery("the", field="content")))
    assert a == b


def test_unknown_field_raises(mf_setup):
    from lucene_solr_spark.operators.multi_field import MultiFieldExecutor

    mf, _, _ = mf_setup
    mex = MultiFieldExecutor(mf, mode="double")
    with pytest.raises(KeyError, match="unknown field"):
        mex.matches(ir.TermQuery("x", field="nope")).collect()


def test_field_phrase_and_prefix(mf_setup):
    """Positional + multi-term leaves also route per-field."""
    from lucene_solr_spark.operators.multi_field import MultiFieldExecutor
    from lucene_solr_spark.plans.df_executor import DFExecutor

    mf, _, title_ix = mf_setup
    sex = DFExecutor(title_ix, mode="double")
    mex = MultiFieldExecutor(mf, mode="double")
    # a real 2-token prefix of some title
    row = title_ix.postings.filter(F.size("positions") >= 1).first()
    doc_title_terms = (
        title_ix.postings.filter(F.col("doc_id") == row["doc_id"])
        .select("term", F.element_at("positions", 1).alias("p0"))
        .orderBy("p0")
        .collect()
    )
    t0, t1 = doc_title_terms[0]["term"], doc_title_terms[1]["term"]
    q = ir.PhraseQuery((t0, t1), field="title")
    got = _rows(mex.matches(q))
    want = _rows(sex.matches(ir.PhraseQuery((t0, t1))))
    assert got == want and got
    gp = sorted(r["doc_id"] for r in mex.matches(
        ir.PrefixQuery(t0[:2], field="title")).collect())
    wp = sorted(r["doc_id"] for r in sex.matches(ir.PrefixQuery(t0[:2])).collect())
    assert gp == wp and gp


def test_multi_field_encode_frame_one_job_equals_sequential(mf_setup):
    """multi_field_encode_frame (round 5): the single unioned encode job
    emits exactly the rows the per-field encode_frame jobs emit — same
    segments, same encoded blobs — just tagged by field and sunk once."""
    from lucene_solr_spark.operators.multi_field import multi_field_encode_frame
    from lucene_solr_spark.operators.segments import encode_frame

    mf, _, _ = mf_setup

    def key(rows, with_field=False):
        out = []
        for r in rows:
            d = r.asDict()
            f = d.pop("field", None)
            out.append((f if with_field else None, tuple(sorted(
                (k, bytes(v) if isinstance(v, (bytes, bytearray)) else v)
                for k, v in d.items()
            ))))
        return sorted(out)

    union_rows = multi_field_encode_frame(mf, segment_size=16).collect()
    seq = []
    for fname, fx in mf.fields.items():
        for r in encode_frame(fx, segment_size=16).collect():
            d = r.asDict()
            d["field"] = fname
            seq.append(d)
    got = sorted(
        (r["field"],) + tuple(
            (k, bytes(v) if isinstance(v, (bytes, bytearray)) else v)
            for k, v in sorted(r.asDict().items()) if k != "field"
        )
        for r in union_rows
    )
    want = sorted(
        (d["field"],) + tuple(
            (k, bytes(v) if isinstance(v, (bytes, bytearray)) else v)
            for k, v in sorted(d.items()) if k != "field"
        )
        for d in seq
    )
    assert got == want and got
