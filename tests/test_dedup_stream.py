"""Streaming dedup: first-seen-wins across micro-batches (state-store
dropDuplicates) and the applyInPandasWithState running dup tracker."""

from __future__ import annotations

import pytest

from lucene_solr_spark.streaming.dedup_stream import (
    dedup_stream,
    dedup_stream_stateful,
)

SCHEMA = "doc_id long, text string"


@pytest.fixture()
def src(spark, tmp_path):
    """Two parquet files → two micro-batches (maxFilesPerTrigger=1):
    batch 1 has an intra-batch dup, batch 2 repeats a batch-1 text."""
    d = tmp_path / "files"
    d.mkdir()
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha beta"), (2, "gamma delta")], SCHEMA
    ).coalesce(1).write.parquet(str(d / "b0"))
    spark.createDataFrame(
        [(3, "gamma delta"), (4, "epsilon zeta")], SCHEMA
    ).coalesce(1).write.parquet(str(d / "b1"))
    return str(d)


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )


def test_dedup_stream_first_seen_wins(spark, src, tmp_path):
    q = (
        dedup_stream(_stream(spark, src), text_col="text")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_out").collect()
    got = sorted((r["doc_id"], r["text"]) for r in rows)
    # one survivor per distinct text; doc 1 (intra-batch dup) and doc 3
    # (cross-batch dup, caught by the state store) are dropped
    texts = [t for _, t in got]
    assert sorted(texts) == ["alpha beta", "epsilon zeta", "gamma delta"]
    assert all(d in (0, 1) for d, t in got if t == "alpha beta")
    assert all(d == 2 for d, t in got if t == "gamma delta")
    assert all(d == 4 for d, t in got if t == "epsilon zeta")


def test_dedup_stream_stateful_accumulates(spark, src, tmp_path):
    batches: list[list] = []

    def sink(df, _bid):
        rows = df.collect()
        if rows:
            batches.append(rows)

    q = (
        dedup_stream_stateful(_stream(spark, src), text_col="text")
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    final = {}
    for rows in batches:
        for r in rows:
            final[r["text_md5"]] = (r["first_doc_id"], r["n_seen"])
    # across both micro-batches: alpha beta seen 2x (first id 0),
    # gamma delta 2x (first id 2), epsilon zeta 1x (id 4)
    assert sorted(final.values()) == [(0, 2), (2, 2), (4, 1)]
    # the state store carried gamma delta's count across batches
    all_counts = [
        (r["first_doc_id"], r["n_seen"]) for rows in batches for r in rows
    ]
    assert (2, 1) in all_counts and (2, 2) in all_counts
