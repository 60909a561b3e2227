"""Field collapsing: keep only the best-scoring document per collapse
key, then rank the survivors (Solr's CollapsingQParserPlugin /
the grouping module's CollapsingTopDocsCollector role — reference
lucene/grouping CollapsingTopDocsCollector semantics: group head = the
top sort entry per key, here (score desc, doc_id asc)).

Spark-first: one window over the scored match set joined to the key
column. The window shuffles on the collapse key — the same single
shuffle any group-top-1 needs at 100 TB; skewed keys parallelize because
row_number only needs a per-partition sort, and no per-group Python
runs anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def collapse_topk(
    scored: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """``scored``: (doc_id, score) match set; ``keys``: a frame carrying
    (doc_id, key_col). Returns (doc_id, score, key_col) — at most one row
    per key value, ordered (score desc, doc_id asc), limit k."""
    keyed = scored.join(keys.select(id_col, key_col), id_col)
    w = Window.partitionBy(key_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
