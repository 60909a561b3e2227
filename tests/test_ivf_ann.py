"""IVF coarse-quantizer ANN — structure, exactness at full probe, and
the recall/nprobe trade (the scale dial)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.similarity import (
    brute_force_cosine_topk,
    ivf_assign,
    ivf_index_topk,
    ivf_probe_lists,
    ivf_topk,
    ivf_train,
    write_ivf_index,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def ivf(spark, emb):
    cents = ivf_train(emb, n_lists=8, seed=42)
    return ivf_assign(emb, cents).persist(), cents


def test_assignment_is_nearest_centroid(ivf):
    assigned, cents = ivf
    rows = assigned.select("vec_id", "embedding", "list_id").limit(50).collect()
    for r in rows:
        v = np.asarray(r["embedding"], np.float64)
        d = ((cents - v) ** 2).sum(axis=1)
        assert int(np.argmin(d)) == r["list_id"]


def test_full_probe_equals_brute_force(emb, ivf):
    assigned, cents = ivf
    q = emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]
    exact = [
        (r["vec_id"], r["cosine"])
        for r in brute_force_cosine_topk(
            emb, list(q), k=10, exclude_ids=(7,)
        ).collect()
    ]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(
            assigned.filter(F.col("vec_id") != 7), cents, list(q), k=10, nprobe=8
        ).collect()
    ]
    assert got == exact


def test_recall_vs_nprobe(emb, ivf):
    """Recall@10 grows with nprobe; at nprobe=1 the query still finds
    most neighbors (clustered data) and never returns a wrong score."""
    assigned, cents = ivf
    queries = [r["embedding"] for r in emb.limit(5).collect()]
    recalls = {}
    for nprobe in (1, 4, 8):
        hits = 0
        for q in queries:
            exact = {
                r["vec_id"]
                for r in brute_force_cosine_topk(emb, list(q), k=10).collect()
            }
            got = {
                r["vec_id"]
                for r in ivf_topk(
                    assigned, cents, list(q), k=10, nprobe=nprobe
                ).collect()
            }
            hits += len(got & exact)
        recalls[nprobe] = hits / (10 * len(queries))
    assert recalls[8] == 1.0
    assert recalls[1] <= recalls[4] <= recalls[8]
    assert recalls[1] > 0.3  # probing the query's own list finds most


def test_materialized_layout_partition_pruning(spark, emb, tmp_path_factory):
    """write_ivf_index partitions by list_id; a probe reads only its
    lists (PartitionFilters in the scan plan) and returns the same
    ranking as the in-memory path."""
    base = str(tmp_path_factory.mktemp("ivf") / "ix")
    cents = write_ivf_index(emb, base, n_lists=8, seed=42)
    q = emb.filter(F.col("vec_id") == 3).select("embedding").collect()[0][0]
    df = ivf_index_topk(spark, base, list(q), k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "list_id" in plan
    assigned = ivf_assign(emb, cents)
    expect = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk(assigned, cents, list(q), k=5, nprobe=2).collect()
    ]
    assert [(r["vec_id"], r["cosine"]) for r in df.collect()] == expect


def test_udf_assignment_parity_with_expression_path(emb):
    """The pandas-UDF matmul-argmin path (n_lists > expr_max_lists) must
    assign every vector to the same list as the fold-expression path."""
    cents = ivf_train(emb, n_lists=16, seed=7)
    via_expr = ivf_assign(emb, cents, expr_max_lists=64)
    via_udf = ivf_assign(emb, cents, expr_max_lists=0)  # force the UDF path
    a = {r["vec_id"]: r["list_id"] for r in via_expr.select("vec_id", "list_id").collect()}
    b = {r["vec_id"]: r["list_id"] for r in via_udf.select("vec_id", "list_id").collect()}
    assert a == b


def test_udf_assignment_at_256_lists_runs_fast(emb):
    """n_lists=256: the expression path would compile a 256-deep plan;
    the UDF path must assign the whole table in seconds."""
    import time

    rng = np.random.default_rng(42)
    cents = rng.normal(size=(256, 64))  # synthetic quantizer: assignment is the SUT
    t0 = time.perf_counter()
    assigned = ivf_assign(emb, cents)  # > expr_max_lists → UDF path
    counts = assigned.groupBy("list_id").count().collect()
    elapsed = time.perf_counter() - t0
    assert sum(r["count"] for r in counts) == emb.count()
    assert all(0 <= r["list_id"] < 256 for r in counts)
    assert elapsed < 30, f"256-list assignment took {elapsed:.1f}s"
    # spot-check correctness against numpy on a sample
    rows = assigned.select("vec_id", "embedding", "list_id").limit(20).collect()
    for r in rows:
        v = np.asarray(r["embedding"], np.float64)
        d = ((cents - v) ** 2).sum(axis=1)
        assert int(np.argmin(d)) == r["list_id"]
