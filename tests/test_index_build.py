"""Spark index build vs the single-node oracle on the tiny corpus —
postings, norms, stats must be identical (docIDs = dense rank over PK)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.index_build import assign_doc_ids, build_index
from lucene_solr_spark.sources.corpus import corpus_to_spark


@pytest.fixture(scope="module")
def spark_index(spark, tiny_corpus_rows):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=5)
    ix = build_index(corpus, keep_cols=("repo", "path", "commit", "content_sha256"))
    ix.persist()
    return ix


def test_doc_id_assignment_dense_and_order(spark, tiny_corpus_rows):
    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=7)
    with_ids = assign_doc_ids(corpus, num_partitions=4).select(
        "doc_id", "repo", "path", "commit"
    )
    rows = sorted(with_ids.collect(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == list(range(len(tiny_corpus_rows)))
    # dense rank over (repo, path, commit) == pre-sorted fixture order
    for i, r in enumerate(rows):
        exp = tiny_corpus_rows[i]
        assert (r["repo"], r["path"], r["commit"]) == (
            exp["repo"],
            exp["path"],
            exp["commit"],
        )


def test_doc_id_assignment_parallelism_invariant(spark):
    corpus = corpus_to_spark(spark, 100, seed=42)
    a = assign_doc_ids(corpus.repartition(3), num_partitions=2)
    b = assign_doc_ids(corpus.repartition(11), num_partitions=9)
    rows_a = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in a.collect()}
    rows_b = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in b.collect()}
    assert rows_a == rows_b


def test_global_stats_match_oracle(spark_index, tiny_oracle):
    assert spark_index.doc_count == tiny_oracle.doc_count
    assert spark_index.sum_ttf == tiny_oracle.sum_ttf


def test_postings_match_oracle(spark_index, tiny_oracle):
    got = {
        (r["term"], r["doc_id"]): (r["tf"], tuple(r["positions"]))
        for r in spark_index.postings.collect()
    }
    expected = {}
    for term, plist in tiny_oracle.postings.items():
        for doc, tf in plist.items():
            expected[(term, doc)] = (tf, tuple(tiny_oracle.positions[term][doc]))
    assert got == expected


def test_norms_match_oracle(spark_index, tiny_oracle):
    got = {r["doc_id"]: r["norm"] for r in spark_index.norms.collect()}
    assert got == tiny_oracle.norms


def test_term_stats_match_oracle(spark_index, tiny_oracle):
    got = {r["term"]: (r["df"], r["ttf"]) for r in spark_index.term_stats.collect()}
    expected = {t: (tiny_oracle.df(t), tiny_oracle.ttf(t)) for t in tiny_oracle.postings}
    assert got == expected


def test_sha256_invariant(spark_index, tiny_corpus_rows):
    """Per-row invariant (BASELINE.json input_hint): the docs manifest
    carries content_sha256 equal to sha256 of the source content."""
    got = {
        (r["repo"], r["path"], r["commit"]): r["content_sha256"]
        for r in spark_index.docs.collect()
    }
    for row in tiny_corpus_rows:
        assert got[(row["repo"], row["path"], row["commit"])] == row["content_sha256"]


def test_parquet_roundtrip(spark, spark_index, tmp_path):
    base = str(tmp_path / "ix")
    spark_index.write_parquet(base, num_term_partitions=4)
    from lucene_solr_spark.operators.index_build import InvertedIndex

    back = InvertedIndex.read_parquet(spark, base)
    assert back.doc_count == spark_index.doc_count
    assert back.sum_ttf == spark_index.sum_ttf
    assert back.postings.count() == spark_index.postings.count()
    # term filter prunes via parquet min/max on the sorted term column
    sub = back.postings.filter(F.col("term") == "def")
    assert sub.count() == back.term_stats.filter(F.col("term") == "def").collect()[0]["df"]
