"""Similarity search over embedding columns.

- brute_force_cosine_topk: exact baseline — sequential fold dot product
  (F.aggregate is an ordered fold, so the double arithmetic is
  deterministic and engine-portable).
- lsh_signature_cols / lsh_bucketed_topk: random-hyperplane LSH —
  candidates from matching sign-buckets, exact re-rank on candidates only.
- write_ann_index / ann_index_topk: the 100 TB path — signatures are
  PRECOMPUTED at index-build time and the table is laid out partitioned
  by (table, sig), so a query is a partition-PRUNED scan of n_tables
  bucket directories (storage n_tables×, the classic multi-table LSH
  trade), never a full-corpus signature scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "with_cosine",
    "brute_force_cosine_topk",
    "lsh_signature_cols",
    "lsh_bucketed_topk",
    "write_ann_index",
    "ann_index_topk",
    "ivf_train",
    "ivf_assign",
    "ivf_probe_lists",
    "ivf_topk",
    "write_ivf_index",
    "ivf_index_topk",
]


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


def _sig_col(emb_col: str, planes: np.ndarray):
    """Sign-signature of one table as a JVM-side integer column."""
    n_planes = len(planes)
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
    return sig


def query_signatures(
    qvec: list[float], n_planes: int, n_tables: int, seed: int = 42
) -> list[int]:
    qv = np.asarray(qvec, dtype=np.float64)
    sigs = []
    for t in range(n_tables):
        planes = _hyperplanes(qv.shape[0], n_planes, seed + t)
        sigs.append(
            int("".join("1" if float(p @ qv) > 0 else "0" for p in planes), 2)
        )
    return sigs


def lsh_signature_cols(
    dim: int, n_planes: int = 8, n_tables: int = 4, seed: int = 42,
    emb_col: str = "embedding",
) -> list:
    """One signature Column per hash table (sig_0..sig_{T-1})."""
    return [
        _sig_col(emb_col, _hyperplanes(dim, n_planes, seed + t)).alias(f"sig_{t}")
        for t in range(n_tables)
    ]


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

    Inline-signature variant (one full scan). The scale path precomputes
    signatures and prunes partitions — write_ann_index / ann_index_topk."""
    dim = len(qvec)
    qsigs = query_signatures(qvec, n_planes, n_tables, seed)
    sigs = lsh_signature_cols(dim, n_planes, n_tables, seed, emb_col)
    with_sigs = df.select("*", *sigs)
    cond = F.col("sig_0") == qsigs[0]
    for t in range(1, n_tables):
        cond = cond | (F.col(f"sig_{t}") == qsigs[t])
    candidates = with_sigs.filter(cond).drop(
        *[f"sig_{t}" for t in range(n_tables)]
    )
    return brute_force_cosine_topk(candidates, qvec, k, id_col, emb_col)


def lsh_match_condition_sql(
    emb_expr: str,
    q_expr: str,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> str:
    """ANSI-SQL predicate: `emb_expr` falls in the same bucket as `q_expr`
    in ANY table. Planes are inlined as literal DOUBLE arrays, so an
    external engine (DuckDB oracle) reproduces the bucketing EXACTLY —
    the correctness gate then checks the real LSH semantics (candidates +
    exact re-rank), not a recall assumption."""

    def sig(expr: str, planes: np.ndarray) -> str:
        parts = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]"
            parts.append(
                f"(CASE WHEN list_inner_product({expr}, {lit}) > 0 "
                f"THEN {1 << (n_planes - 1 - i)} ELSE 0 END)"
            )
        return "(" + " + ".join(parts) + ")"

    conds = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        conds.append(f"({sig(emb_expr, planes)} = {sig(q_expr, planes)})")
    return "(" + " OR ".join(conds) + ")"


def write_ann_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> None:
    """Materialize the multi-table LSH layout: each row is replicated into
    its bucket of every table and written partitioned by (tbl, sig) —
    signatures computed ONCE at build time, map-side (no shuffle; the
    partitioned write's files are bucket-local)."""
    dim = len(df.select(emb_col).first()[0])
    sigs = lsh_signature_cols(dim, n_planes, n_tables, seed, emb_col)
    with_sigs = df.select(id_col, emb_col, *sigs)
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"), F.col(f"sig_{t}").alias("sig")
            )
            for t in range(n_tables)
        ]
    )
    exploded = (
        with_sigs.select(id_col, emb_col, F.explode(tables).alias("ts"))
        .select(id_col, emb_col, F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))
    )
    exploded.write.mode("overwrite").partitionBy("tbl", "sig").parquet(path)


def ann_index_topk(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Query the precomputed layout: Catalyst partition pruning reduces
    the scan to the query's n_tables bucket directories; exact re-rank
    runs only on those candidates."""
    qsigs = query_signatures(qvec, n_planes, n_tables, seed)
    scan = spark.read.parquet(path)
    cond = (F.col("tbl") == 0) & (F.col("sig") == qsigs[0])
    for t in range(1, n_tables):
        cond = cond | ((F.col("tbl") == t) & (F.col("sig") == qsigs[t]))
    candidates = scan.filter(cond).select(id_col, emb_col).dropDuplicates([id_col])
    return brute_force_cosine_topk(candidates, qvec, k, id_col, emb_col)


# ------------------------------------------------------------------ IVF
def ivf_train(
    df: DataFrame,
    n_lists: int = 16,
    *,
    emb_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Train the IVF coarse quantizer: k-means centroids over the
    embedding column (inverted-file ANN — Jégou/Douze/Schmid, "Product
    quantization for nearest neighbor search", TPAMI 2011, §IV.A; the
    coarse stage only, no product quantization).

    Distributed: pyspark.ml KMeans (k-means|| init, seeded) over the
    Arrow-bridged vector column; at 100 TB train on a ``sample_fraction``
    and assign the full table afterwards (FAISS's standard recipe)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df if sample_fraction is None else df.sample(sample_fraction, seed)
    vecs = train.select(array_to_vector(F.col(emb_col)).alias("features"))
    model = KMeans(k=n_lists, seed=seed, maxIter=max_iter).fit(vecs)
    return np.asarray([np.asarray(c) for c in model.clusterCenters()])


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    emb_col: str = "embedding",
    expr_max_lists: int = 64,
) -> DataFrame:
    """Assign every vector to its nearest centroid → + ``list_id`` column.

    Two physical strategies, same semantics (argmin of squared euclidean,
    first index wins ties):

    - n_lists ≤ ``expr_max_lists``: JVM-side fold expressions + a
      comparison chain — whole-stage codegen, no Python. The plan carries
      one expression PER centroid, so this path stops being viable in the
      hundreds (Catalyst plan compilation explodes).
    - n_lists > ``expr_max_lists``: ONE Arrow-batched pandas UDF doing a
      matmul-argmin against the broadcast centroid matrix
      (``d² = |v|² − 2 v·Cᵀ + |C|²``) — plan size O(1) in n_lists, batch
      cost one BLAS call; the path a 100 TB corpus (n_lists 1k-64k) needs.

    Both are map-only: no shuffle either way."""
    if len(centroids) > expr_max_lists:
        return _ivf_assign_udf(df, centroids, emb_col=emb_col)
    dists = []
    for li, c in enumerate(centroids):
        clit = F.lit([float(x) for x in c])
        d = F.aggregate(
            F.zip_with(
                F.col(emb_col),
                clit,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(d.alias(f"_d{li}"))
    with_d = df.select("*", *dists)
    best = F.lit(0)
    bestd = F.col("_d0")
    for li in range(1, len(centroids)):
        cond = F.col(f"_d{li}") < bestd
        best = F.when(cond, F.lit(li)).otherwise(best)
        bestd = F.when(cond, F.col(f"_d{li}")).otherwise(bestd)
    return with_d.withColumn("list_id", best).drop(
        *[f"_d{li}" for li in range(len(centroids))]
    )


def _ivf_assign_udf(
    df: DataFrame, centroids: np.ndarray, *, emb_col: str
) -> DataFrame:
    """Pandas-UDF assignment path: nearest centroid per Arrow batch via a
    single matmul-argmin. np.argmin keeps the first index on exact ties —
    the same winner as the expression path's strict-< chain."""
    from pyspark.sql import types as T

    cmat = np.ascontiguousarray(np.asarray(centroids, np.float64))
    c_sq = (cmat * cmat).sum(axis=1)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(emb: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, np.float64) for v in emb], np.float64)
        if m.size == 0:
            return pd.Series([], dtype="int32")
        # ||v-c||² = ||v||² - 2 v·c + ||c||²; ||v||² is constant per row,
        # so the argmin only needs the last two terms
        d2 = c_sq[None, :] - 2.0 * (m @ cmat.T)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32), index=emb.index)

    return df.withColumn("list_id", assign_udf(F.col(emb_col)))


def ivf_probe_lists(
    centroids: np.ndarray, qvec: list[float], nprobe: int
) -> list[int]:
    """The nprobe nearest inverted lists for a query (euclidean to the
    centroids, matching the quantizer's training metric)."""
    q = np.asarray(qvec, np.float64)
    d = ((centroids - q) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d, kind="stable")[:nprobe]]


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: list[float],
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF query: exact cosine re-rank over the vectors of the ``nprobe``
    nearest lists only. ``nprobe == n_lists`` degenerates to the exact
    brute-force scan (the correctness-gate configuration); small nprobe
    is the recall/throughput dial. Over the ``write_ivf_index`` layout
    the list filter becomes parquet partition PRUNING — a probe touches
    nprobe directories, never the full corpus."""
    lists = ivf_probe_lists(centroids, qvec, nprobe)
    cand = assigned.filter(F.col("list_id").isin(lists))
    return brute_force_cosine_topk(cand, qvec, k, id_col, emb_col)


def write_ivf_index(
    df: DataFrame,
    path: str,
    n_lists: int = 16,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Materialize the IVF layout: vectors written partitioned by
    ``list_id``, centroids saved alongside (ivf_centroids.npy). Returns
    the centroids."""
    import os

    centroids = ivf_train(
        df, n_lists, emb_col=emb_col, seed=seed, sample_fraction=sample_fraction
    )
    assigned = ivf_assign(df, centroids, emb_col=emb_col)
    assigned.select(id_col, emb_col, "list_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(path)
    # underscore prefix: data-source readers skip it like _SUCCESS
    np.save(os.path.join(path, "_ivf_centroids.npy"), centroids)
    return centroids


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    k: int = 10,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Query the materialized IVF layout (partition-pruned scan)."""
    import os

    centroids = np.load(os.path.join(path, "_ivf_centroids.npy"))
    assigned = spark.read.parquet(path)
    return ivf_topk(
        assigned, centroids, qvec, k, nprobe=nprobe, id_col=id_col, emb_col=emb_col
    )
