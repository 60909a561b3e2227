"""ShingleFilter semantics (analysis/shingle/ShingleFilter.java), pinned
against the reference's TestShingleFilter expectations."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_spark.functions.shingles import add_shingles


def run(tokens, n_docs=1, end=None, **kw):
    doc = np.array([t[0] for t in tokens], np.int64)
    terms = pa.array([t[1] for t in tokens], pa.string())
    pos = np.array([t[2] for t in tokens], np.int32)
    d, t, p = add_shingles(doc, terms, pos, n_docs=n_docs, doc_end_pos=end, **kw)
    return sorted(
        zip(d.tolist(), t.to_pylist(), p.tolist()),
        key=lambda x: (x[0], x[2], len(x[1])),
    )


def test_basic_bigrams():
    # the class-javadoc example (ShingleFilter.java:34-36)
    words = "please divide this sentence into shingles".split()
    out = run([(0, w, i) for i, w in enumerate(words)])
    bi = [t for _, t, _ in out if " " in t]
    assert bi == [
        "please divide",
        "divide this",
        "this sentence",
        "sentence into",
        "into shingles",
    ]
    # unigrams pass through at their positions
    assert [(t, p) for _, t, p in out if " " not in t] == [
        (w, i) for i, w in enumerate(words)
    ]


def test_trailing_hole():
    # TestShingleFilter.java:1264-1277 — "wizard of", of stopped:
    # {"wizard", "wizard _"}
    out = run([(0, "wizard", 0)], end=np.array([2]))
    assert [(t, p) for _, t, p in out] == [("wizard", 0), ("wizard _", 0)]


def test_two_trailing_holes_no_all_filler_shingle():
    # TestShingleFilter.java:1294+ — two trailing holes still emit only
    # ONE "wizard _"; "_ _" (no real token) is never emitted
    out = run([(0, "purple", 0), (0, "wizard", 1)], end=np.array([4]))
    assert [(t, p) for _, t, p in out] == [
        ("purple", 0),
        ("purple wizard", 0),
        ("wizard", 1),
        ("wizard _", 1),
    ]


def test_internal_holes_emit_filler_shingles():
    # TestShingleFilter.java:600-631 pattern: internal 2-slot hole with
    # trigram windows emits filler-bearing shingles on both sides
    out = run(
        [(0, "this", 0), (0, "sentence", 3), (0, "into", 4)],
        min_size=2,
        max_size=3,
    )
    got = [(t, p) for _, t, p in out]
    for want in [
        ("this _", 0),
        ("this _ _", 0),
        ("_ _ sentence", 1),
        ("_ sentence", 2),
        ("_ sentence into", 2),
        ("sentence into", 3),
    ]:
        assert want in got
    assert all(t.replace("_", "").strip() for _, t, _ in out)


def test_no_cross_document_shingles():
    out = run([(0, "a", 0), (0, "b", 1), (1, "c", 0), (1, "d", 1)], n_docs=2)
    assert [(d, t) for d, t, _ in out if " " in t] == [(0, "a b"), (1, "c d")]


def test_output_unigrams_off():
    out = run([(0, "a", 0), (0, "b", 1)], output_unigrams=False)
    assert [t for _, t, _ in out] == ["a b"]


def test_bad_sizes():
    with pytest.raises(ValueError):
        run([(0, "a", 0)], min_size=1, max_size=2)
    with pytest.raises(ValueError):
        run([(0, "a", 0)], min_size=3, max_size=2)


def test_index_build_with_shingles(spark):
    """Shingled index end-to-end: bigram terms searchable, norms count
    every emitted token (unigrams + shingles)."""
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.createDataFrame(
        [(0, "table scan runs fast"), (1, "scan table table scan"), (2, "no match")],
        "doc_id long, text string",
    )
    ix = build_index(docs, text_col="text", doc_id_col="doc_id", shingles=(2, 2))
    hits = {
        r["doc_id"]
        for r in DFExecutor(ix, mode="double")
        .matches(ir.TermQuery("table scan"))
        .collect()
    }
    assert hits == {0, 1}
    # doc 0: 4 unigrams + 3 bigrams = 7 emitted tokens
    lens = {r["doc_id"]: r["length"] for r in ix.docs.select("doc_id", "length").collect()}
    assert lens[0] == 7 and lens[1] == 7 and lens[2] == 3
