"""Product quantization for ANN at 100 TB scale — Jégou, Douze, Schmid,
"Product quantization for nearest neighbor search", TPAMI 2011 (§II-III:
PQ codes + asymmetric distance computation; §IV: IVFADC). Complements
the IVF coarse stage in ``functions/similarity.py``: IVF prunes WHICH
vectors to score, PQ compresses HOW they are stored/scored — m bytes per
vector instead of 4·dim, so a 768-dim float corpus shrinks ~384× and the
probe scan reads codes, not raw vectors.

Spark mapping:
- ``pq_train``: codebooks from a bounded driver-side sample (the FAISS
  recipe — training needs ~100k vectors regardless of corpus size), one
  seeded Lloyd's k-means per subspace in numpy. Deterministic.
- ``pq_encode``: ONE Arrow-batched pandas UDF, m matmul-argmins per
  batch against the broadcast codebooks → ``array<int>`` codes. Map-only.
- ``pq_adc_topk``: asymmetric distance — the query builds an m×k_sub
  lookup table driver-side; a pandas UDF sums table entries per code
  (pure numpy take+sum, no per-row Python); exact re-rank of the top
  ``refine`` candidates against the raw vectors restores near-exact
  top-k (ADC+R, §V).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
    "encode_reference",
    "write_ivfpq_index",
    "ivfpq_index_topk",
]


def _kmeans_1sub(x: np.ndarray, k: int, seed: int, iters: int) -> np.ndarray:
    """Seeded Lloyd's over one subspace (x: [n, dsub]) → [k, dsub]."""
    rng = np.random.default_rng(seed)
    n = len(x)
    init = rng.choice(n, size=min(k, n), replace=False)
    cent = x[np.sort(init)].astype(np.float64).copy()
    if len(cent) < k:  # degenerate tiny sample: pad with repeats
        cent = np.vstack([cent] * ((k // len(cent)) + 1))[:k]
    for _ in range(iters):
        d2 = (
            (cent * cent).sum(1)[None, :] - 2.0 * (x @ cent.T)
        )  # + ||x||² constant per row
        a = np.argmin(d2, axis=1)
        for j in range(k):
            sel = x[a == j]
            if len(sel):
                cent[j] = sel.mean(axis=0)
    return cent


def pq_train(
    df: DataFrame,
    m: int = 8,
    nbits: int = 8,
    *,
    emb_col: str = "embedding",
    seed: int = 42,
    max_train: int = 100_000,
    iters: int = 10,
) -> np.ndarray:
    """Train PQ codebooks → array [m, 2^nbits, dim/m].

    The embedding dim must divide evenly by ``m`` (the reference
    implementation's constraint). Training pulls a seeded sample of at
    most ``max_train`` vectors to the driver — constant-bounded
    regardless of corpus size."""
    ksub = 1 << nbits
    sample = (
        df.select(emb_col)
        .orderBy(F.xxhash64(F.col(emb_col).cast("string"), F.lit(seed)))
        .limit(max_train)
        .collect()
    )
    x = np.asarray([r[emb_col] for r in sample], np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), np.float64)
    for j in range(m):
        books[j] = _kmeans_1sub(
            x[:, j * dsub : (j + 1) * dsub], ksub, seed + j, iters
        )
    return books


def encode_reference(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Driver-side reference encoder (parity target for the UDF):
    per-subspace argmin, first index wins ties."""
    m, _ksub, dsub = books.shape
    out = np.empty((len(vecs), m), np.int32)
    for j in range(m):
        sub = vecs[:, j * dsub : (j + 1) * dsub]
        c = books[j]
        d2 = (c * c).sum(1)[None, :] - 2.0 * (sub @ c.T)
        out[:, j] = np.argmin(d2, axis=1)
    return out


def pq_encode(
    df: DataFrame,
    books: np.ndarray,
    *,
    emb_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """+ ``code_col``: array<int> of m codebook indices per vector."""
    m, _ksub, dsub = books.shape
    bb = np.ascontiguousarray(books)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(emb: pd.Series) -> pd.Series:
        v = np.asarray([np.asarray(e, np.float64) for e in emb], np.float64)
        if v.size == 0:
            return pd.Series([], dtype=object)
        codes = encode_reference(v, bb)
        return pd.Series(list(codes), index=emb.index)

    return df.withColumn(code_col, enc(F.col(emb_col)))


def pq_adc_topk(
    encoded: DataFrame,
    books: np.ndarray,
    qvec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    code_col: str = "pq_code",
    refine: int = 0,
) -> DataFrame:
    """Asymmetric-distance top-k: smallest Σ_j table[j, code_j] (squared
    euclidean to the query, approximated by the codebooks — TPAMI 2011
    eq. 13). ``refine > 0`` re-ranks the ``max(k, refine)`` best ADC
    candidates by EXACT cosine over the raw vectors (ADC+R) and returns
    (id, score) like the exact searchers; ``refine == 0`` returns
    (id, adc_dist)."""
    q = np.asarray(qvec, np.float64)
    m, ksub, dsub = books.shape
    table = np.empty((m, ksub), np.float64)
    for j in range(m):
        diff = books[j] - q[j * dsub : (j + 1) * dsub][None, :]
        table[j] = (diff * diff).sum(axis=1)
    tt = table  # broadcast via closure

    @F.pandas_udf(T.DoubleType())
    def adc(codes: pd.Series) -> pd.Series:
        c = np.asarray([np.asarray(x, np.int64) for x in codes], np.int64)
        if c.size == 0:
            return pd.Series([], dtype="float64")
        d = tt[np.arange(m)[None, :], c].sum(axis=1)
        return pd.Series(d, index=codes.index)

    scored = encoded.withColumn("adc_dist", adc(F.col(code_col)))
    if refine <= 0:
        return (
            scored.select(id_col, "adc_dist")
            .orderBy(F.asc("adc_dist"), F.asc(id_col))
            .limit(k)
        )
    n_ref = max(k, refine)
    cand = scored.orderBy(F.asc("adc_dist"), F.asc(id_col)).limit(n_ref)
    from lucene_solr_spark.functions.similarity import brute_force_cosine_topk

    return brute_force_cosine_topk(cand, qvec, k, id_col, emb_col)


def write_ivfpq_index(
    df: DataFrame,
    path: str,
    *,
    n_lists: int = 16,
    m: int = 8,
    nbits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
    keep_raw: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """IVFADC layout (TPAMI 2011 §IV): coarse IVF partitioning + PQ codes
    per vector, written partitioned by ``list_id``. A probe reads nprobe
    directories of m-byte codes (not raw vectors); ``keep_raw`` also
    stores the raw vector column for the exact-refine stage (drop it at
    extreme scale and refine from the source table instead).

    Returns (centroids, codebooks)."""
    import os

    from lucene_solr_spark.functions.similarity import ivf_assign, ivf_train

    centroids = ivf_train(
        df, n_lists, emb_col=emb_col, seed=seed, sample_fraction=sample_fraction
    )
    books = pq_train(df, m=m, nbits=nbits, emb_col=emb_col, seed=seed)
    assigned = pq_encode(
        ivf_assign(df, centroids, emb_col=emb_col), books, emb_col=emb_col
    )
    cols = [id_col, "pq_code", "list_id"] + ([emb_col] if keep_raw else [])
    assigned.select(*cols).write.mode("overwrite").partitionBy(
        "list_id"
    ).parquet(path)
    np.save(os.path.join(path, "_ivf_centroids.npy"), centroids)
    np.save(os.path.join(path, "_pq_codebooks.npy"), books)
    return centroids, books


def ivfpq_index_topk(
    spark,
    path: str,
    qvec: list[float],
    k: int = 10,
    *,
    nprobe: int = 4,
    refine: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Query the IVFADC layout: partition-pruned scan of the nprobe
    nearest lists' PQ codes → ADC top-``refine`` → exact cosine top-k."""
    import os

    from lucene_solr_spark.functions.similarity import ivf_probe_lists

    centroids = np.load(os.path.join(path, "_ivf_centroids.npy"))
    books = np.load(os.path.join(path, "_pq_codebooks.npy"))
    lists = ivf_probe_lists(centroids, qvec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("list_id").isin(lists))
    return pq_adc_topk(
        cand, books, qvec, k, id_col=id_col, emb_col=emb_col, refine=refine
    )
