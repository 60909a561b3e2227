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

#: Solr CollapsingQParserPlugin nullPolicy values.
NULL_POLICIES = ("ignore", "expand", "collapse")


def collapse_topk(
    scored: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = 10,
    id_col: str = "doc_id",
    null_policy: str = "ignore",
) -> DataFrame:
    """``scored``: (doc_id, score) match set; ``keys``: a frame carrying
    (doc_id, key_col) with AT MOST ONE row per doc_id (duplicate doc_id
    rows would fan out scored rows — the single-valued-field requirement
    CollapsingQParserPlugin imposes). Returns (doc_id, score, key_col) —
    at most one row per key value, ordered (score desc, doc_id asc),
    limit k.

    ``null_policy`` mirrors Solr's nullPolicy: ``"ignore"`` (the Solr
    default) drops null-key docs before collapsing; ``"expand"`` lets
    every null-key doc through as its own group; ``"collapse"`` treats
    null as one ordinary key value (a single group — what a bare window
    partition would do)."""
    if null_policy not in NULL_POLICIES:
        raise ValueError(
            f"null_policy must be one of {NULL_POLICIES}, got {null_policy!r}"
        )
    keyed = scored.join(keys.select(id_col, key_col), id_col)
    if null_policy == "ignore":
        keyed = keyed.filter(F.col(key_col).isNotNull())
        part = [key_col]
    elif null_policy == "expand":
        # null-key docs each form their own group: partition nulls by the
        # (unique) doc id so row_number is 1 for every one of them
        part = [key_col, F.when(F.col(key_col).isNull(), F.col(id_col))]
    else:  # "collapse": nulls are one group — the window's native grouping
        part = [key_col]
    w = Window.partitionBy(*part).orderBy(F.desc("score"), F.asc(id_col))
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def diversified_topk(
    scored: "DataFrame",
    keys: "DataFrame",
    k: int,
    max_hits_per_key: int,
    key_col: str = "key",
) -> "DataFrame":
    """DiversifiedTopDocsCollector (``misc/search/
    DiversifiedTopDocsCollector.java:36-81``): the global top-k with at
    most ``maxHitsPerKey`` hits per key — the streaming collector's
    greedy per-key eviction converges to exactly "per key keep its top
    maxHitsPerKey, then global top-k", which is the declarative form
    here: one window rank per key, one global top-k.  ``scored`` is any
    (doc_id, score) frame; ``keys`` maps doc_id → key (a doc with no
    key never matches the diversity constraint and is dropped, like a
    missing docvalue)."""
    from pyspark.sql import Window, functions as F

    ranked = (
        scored.join(keys, "doc_id")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(key_col).orderBy(
                    F.desc("score"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("_rn") <= int(max_hits_per_key))
        .drop("_rn")
    )
    return ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(k))
