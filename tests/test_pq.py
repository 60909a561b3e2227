"""Product quantization (TPAMI 2011) — encode parity, ADC parity vs the
numpy reference, and an ADC+refine recall floor on clustered data."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.functions.pq import (
    encode_reference,
    pq_adc_topk,
    pq_encode,
    pq_train,
)


def _clustered(n=400, dim=16, n_clusters=8, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, dim)) * 5.0
    assign = rng.integers(0, n_clusters, n)
    x = cents[assign] + rng.normal(size=(n, dim)) * 0.3
    return x


@pytest.fixture(scope="module")
def pq_setup(spark):
    x = _clustered()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    books = pq_train(df, m=4, nbits=4, max_train=400, iters=8)
    return x, df, books


def test_codebook_shape(pq_setup):
    _x, _df, books = pq_setup
    assert books.shape == (4, 16, 4)


def test_encode_matches_reference(pq_setup):
    x, df, books = pq_setup
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(df, books).select("vec_id", "pq_code").collect()
    }
    want = encode_reference(x, books)
    for i in range(len(x)):
        assert got[i] == list(want[i])


def test_adc_matches_reference_table(pq_setup):
    x, df, books = pq_setup
    q = [float(v) for v in x[0]]
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_topk(
            pq_encode(df, books), books, q, k=400
        ).collect()
    }
    # numpy reference: distance table lookups over reference codes
    codes = encode_reference(x, books)
    qv = np.asarray(q)
    m, ksub, dsub = books.shape
    table = np.stack(
        [
            ((books[j] - qv[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)
            for j in range(m)
        ]
    )
    want = table[np.arange(m)[None, :], codes].sum(axis=1)
    for i, d in got.items():
        assert d == pytest.approx(want[i], rel=1e-12)


def test_adc_refine_recall(pq_setup):
    """ADC top-50 refined by exact cosine must recover ≥ 8/10 of the
    exact brute-force top-10 on clustered data — the ADC+R contract."""
    from lucene_solr_spark.functions.similarity import brute_force_cosine_topk

    x, df, books = pq_setup
    q = [float(v) for v in (x[3] + 0.01)]
    exact = [
        r["vec_id"] for r in brute_force_cosine_topk(df, q, 10).collect()
    ]
    approx = [
        r["vec_id"]
        for r in pq_adc_topk(
            pq_encode(df, books), books, q, k=10, refine=50
        ).collect()
    ]
    assert len(set(exact) & set(approx)) >= 8
    # and the refined scores come from the exact cosine path
    assert approx[0] == exact[0]


def test_ivfpq_layout_and_probe(spark, tmp_path):
    """IVFADC end-to-end: partitioned code layout, pruned probe, refined
    top-k ≈ exact. Full-probe + wide refine == exact brute force."""
    from lucene_solr_spark.functions.pq import ivfpq_index_topk, write_ivfpq_index
    from lucene_solr_spark.functions.similarity import brute_force_cosine_topk

    x = _clustered(n=300, dim=16)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    path = str(tmp_path / "ivfpq")
    cents, books = write_ivfpq_index(
        df, path, n_lists=4, m=4, nbits=4
    )
    assert cents.shape == (4, 16) and books.shape == (4, 16, 4)
    import os

    assert sorted(
        d for d in os.listdir(path) if d.startswith("list_id=")
    ) == [f"list_id={i}" for i in range(4)]

    q = [float(v) for v in (x[7] + 0.02)]
    exact = [r["vec_id"] for r in brute_force_cosine_topk(df, q, 10).collect()]
    # full probe + refine covering the corpus == exact
    got = [
        r["vec_id"]
        for r in ivfpq_index_topk(
            spark, path, q, 10, nprobe=4, refine=300
        ).collect()
    ]
    assert got == exact
    # pruned probe with modest refine still recovers most of the top-10
    approx = [
        r["vec_id"]
        for r in ivfpq_index_topk(
            spark, path, q, 10, nprobe=2, refine=50
        ).collect()
    ]
    assert len(set(approx) & set(exact)) >= 7
