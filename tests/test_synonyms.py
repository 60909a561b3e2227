"""Index-time synonym injection (SynonymGraphFilter expand role):
stacked posIncr=0 tokens, overlap-discounted norms
(BM25Similarity.java:138-148)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_solr_spark.functions.synonyms import inject_synonyms


def test_inject_stacks_at_source_positions():
    doc = np.array([0, 0, 1], np.int64)
    terms = pa.array(["slow", "scan", "slow"], pa.string())
    pos = np.array([0, 1, 5], np.int32)
    d, t, p, ovl = inject_synonyms(doc, terms, pos, {"slow": ("fast", "lazy")})
    rows = sorted(zip(d.tolist(), t.to_pylist(), p.tolist(), ovl.tolist()))
    # originals untouched + one stacked token per synonym per occurrence
    assert rows == [
        (0, "fast", 0, True),
        (0, "lazy", 0, True),
        (0, "scan", 1, False),
        (0, "slow", 0, False),
        (1, "fast", 5, True),
        (1, "lazy", 5, True),
        (1, "slow", 5, False),
    ]


def test_inject_no_match_is_identity():
    doc = np.array([0], np.int64)
    terms = pa.array(["scan"], pa.string())
    pos = np.array([3], np.int32)
    d, t, p, ovl = inject_synonyms(doc, terms, pos, {"slow": ("fast",)})
    assert d.tolist() == [0] and t.to_pylist() == ["scan"] and p.tolist() == [3]
    assert not ovl.any()


def test_index_build_synonyms_merge_tf_and_discount_norms(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.createDataFrame(
        [
            (0, "slow scan fast"),  # fast posting: 1 real + 1 stacked = tf 2
            (1, "slow slow"),  # fast posting: tf 2, both stacked
            (2, "fast fast fast"),  # untouched
        ],
        "doc_id long, text string",
    )
    ix = build_index(
        docs, text_col="text", doc_id_col="doc_id", synonyms={"slow": ("fast",)}
    )
    posts = {
        (r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in ix.postings.filter(ix.postings.term == "fast").collect()
    }
    assert posts[0] == (2, [0, 2])  # stacked@0 + real@2, positions sorted
    assert posts[1] == (2, [0, 1])
    assert posts[2] == (3, [0, 1, 2])
    assert "otf" not in ix.postings.columns  # std schema downstream
    # norms discount stacked tokens: length = BASE token count
    lens = {r["doc_id"]: r["length"] for r in ix.docs.collect()}
    assert lens == {0: 3, 1: 2, 2: 3}
    # avgdl still counts stacked tokens (sum_ttf over postings)
    assert ix.sum_ttf == 3 + 1 + 2 + 2 + 3  # slow:2 docs(2,1? ) -> recompute
    # doc0: slow1+scan1+fast2 =4; doc1: slow2+fast2 =4; doc2: fast3 =3
    assert ix.sum_ttf == 11
    # search sees merged postings
    hits = {
        r["doc_id"]
        for r in DFExecutor(ix, mode="double").matches(ir.TermQuery("fast")).collect()
    }
    assert hits == {0, 1, 2}
