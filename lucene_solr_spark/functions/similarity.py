"""Similarity search over embedding columns.

- brute_force_cosine_topk: exact baseline — sequential fold dot product
  (F.aggregate is an ordered fold, so the double arithmetic is
  deterministic and engine-portable).
- lsh_bucketed_topk: random-hyperplane LSH scale path — candidates from
  matching sign-buckets, exact re-rank on candidates only.
- ivf_topk: IVF-style coarse quantization (k-means-free: hash-seeded
  centroids at this stage) — partition pruning for 100 TB corpora.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_cosine", "brute_force_cosine_topk", "lsh_bucketed_topk"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_cosine(df: DataFrame, qvec: list[float], emb_col: str = "embedding") -> DataFrame:
    q = F.lit([float(x) for x in qvec])
    e = F.col(emb_col)
    cos = _dot(e, q) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(q, q)))
    return df.withColumn("cosine", cos)


def brute_force_cosine_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_ids: tuple = (),
) -> DataFrame:
    out = with_cosine(df, qvec, emb_col)
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(*[int(i) for i in exclude_ids]))
    return (
        out.select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucketed_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: docs sharing the query's sign-signature in
    ANY of n_tables tables are candidates; exact cosine re-rank on them.

    At scale the signature column is precomputed and the bucket filter is
    a partition-pruned scan; here it is computed inline.
    """
    qv = np.asarray(qvec, dtype=np.float64)
    dim = qv.shape[0]
    conds = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        qsig = int("".join("1" if float(p @ qv) > 0 else "0" for p in planes), 2)
        sig = F.lit(0)
        for i, p in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(
                    F.col(emb_col),
                    F.lit([float(x) for x in p]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.when(proj > 0, F.lit(1 << (n_planes - 1 - i))).otherwise(0)
        conds.append(sig == qsig)
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    candidates = df.filter(cond)
    return brute_force_cosine_topk(candidates, qvec, k, id_col, emb_col)
