"""Facade (SearchEngine) end-to-end: index → search strings → append →
merge → reopen."""

from __future__ import annotations

import struct

from lucene_solr_spark.api import SearchEngine
from lucene_solr_spark.sources.corpus import corpus_to_spark, make_corpus_rows


def bits(x) -> int:
    return struct.unpack("<I", struct.pack("<f", float(x)))[0]


def test_api_end_to_end(spark, tmp_path_factory, tiny_oracle):
    base = str(tmp_path_factory.mktemp("apix"))
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    eng = SearchEngine.index_corpus(spark, corpus, base, segment_size=32)

    assert eng.stats()["doc_count"] == 100

    # string queries → Lucene-parity rankings
    from lucene_solr_spark.plans.parser import parse_query

    for qs in ("def", "+def +class", "error OR warning", '"x y"'):
        hits = eng.search(qs, k=5)
        expected = [
            (sd.doc_id, bits(sd.score))
            for sd in tiny_oracle.search(parse_query(qs), k=5)
        ]
        assert [(h.doc_id, bits(h.score)) for h in hits] == expected, qs

    # batched
    res = eng.search_batch({"a": "def", "b": "merge window"}, k=3)
    assert res.count() == 6

    # count
    assert eng.count("def") == tiny_oracle.count(parse_query("def"))

    # append + reopen
    extra = spark.createDataFrame(make_corpus_rows(10, seed=99), corpus.schema)
    sid = eng.append(extra)
    assert sid is not None
    assert eng.stats()["doc_count"] == 110
    assert eng.search("def", k=5)

    # merge
    eng.merge()
    assert eng.stats()["doc_count"] == 110
    assert len(eng.search("def", k=5)) == 5


def test_explain_matches_search_value(spark, tmp_path_factory):
    """CheckHits contract: explain(q, doc).value == the doc's search
    score, exactly; boolean breakdown sums clause values; non-matching
    docs explain as match=False."""
    from lucene_solr_spark.api import SearchEngine
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    base = str(tmp_path_factory.mktemp("exix"))
    eng = SearchEngine.index_corpus(
        spark, corpus_to_spark(spark, 100, seed=42), base, segment_size=32
    )
    qs = "+def return"
    hits = eng.search(qs, k=3)
    assert hits
    for h in hits:
        e = eng.explain(qs, h.doc_id)
        assert e["match"] is True
        assert e["value"] == h.score
        assert e["description"] == "sum of:"
        occurs = {d["occur"] for d in e["details"]}
        assert occurs == {"MUST", "SHOULD"}
        # term leaf details expose boost + idf inputs
        leaf = e["details"][0]
        assert leaf["description"].startswith("weight(")
        assert leaf["details"][0]["description"] == "boost"
    # a doc that cannot match (no 'def'): match=False, value 0
    nohit_ids = {h.doc_id for h in hits}
    all_ids = {h.doc_id for h in eng.search("def", k=100)}
    missing = next(i for i in range(100) if i not in all_ids)
    e = eng.explain("+def", missing)
    assert e["match"] is False and e["value"] == 0.0


def test_explain_df_executor(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    ix = build_index(corpus_to_spark(spark, 60, seed=42)).persist()
    ex = DFExecutor(ix, mode="double")
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("def")),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("return")),
        ),
        0,
    )
    top = ex.topk(q, k=1).collect()[0]
    e = ex.explain(q, top["doc_id"])
    assert e["value"] == top["score"]
    assert e["details"][0]["occur"] == "MUST"


def test_explain_df_executor_node_values_one_pass(spark):
    """The one-job explain (round 4): every node's value in a deep
    boolean tree still equals that subtree's standalone engine score for
    the doc (CheckHits per node), including non-matching clauses and a
    nested boost — pinning the traversal-order contract between the
    collection pass and the rendering pass."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    ix = build_index(corpus_to_spark(spark, 60, seed=42)).persist()
    ex = DFExecutor(ix, mode="double")
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("def")),
            ir.BooleanClause(ir.Occur.SHOULD, ir.BoostQuery(ir.TermQuery("return"), 2.0)),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("zzzznothing")),
            ir.BooleanClause(ir.Occur.MUST_NOT, ir.TermQuery("qqqabsent")),
        ),
        0,
    )
    top = ex.topk(q, k=1).collect()[0]
    doc = top["doc_id"]
    e = ex.explain(q, doc)
    assert e["value"] == top["score"]

    def standalone(sub, boost=1.0):
        rows = (
            ex._eval(sub, boost)
            .filter(F.col("doc_id") == doc)
            .select("score")
            .collect()
        )
        return float(rows[0]["score"]) if rows else None

    # clause order preserved; each detail's value == standalone eval
    d = e["details"]
    assert d[0]["occur"] == "MUST" and d[0]["value"] == standalone(ir.TermQuery("def"))
    # boost wrapper: value equals the boosted subtree's engine score
    assert d[1]["value"] == standalone(ir.TermQuery("return"), 2.0)
    assert d[2]["match"] is False and d[2]["value"] == 0.0
    assert d[3]["occur"] == "MUST_NOT"
