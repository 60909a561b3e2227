"""FunctionScoreQuery — the ``lucene/queries/function`` module's entry
point (``queries/src/java/org/apache/lucene/queries/function/
FunctionScoreQuery.java:40-90``): wrap a query and replace its score
with a DoubleValuesSource expression; the helpers ``boostByValue`` /
``boostByQuery`` (``:52-75``) multiply the wrapped query's score into
the expression via the ``_score`` variable.

Spark mapping: the DoubleValuesSource IS a Catalyst expression — the
per-doc value columns live in the docs table, the wrapped query's score
arrives as ``_score``, and ``F.expr`` compiles the combination into
whole-stage codegen. No UDF, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["function_score"]


def function_score(
    matches: DataFrame,
    values: DataFrame,
    expr: str,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Re-score ``matches`` (doc_id, score) with ``expr``.

    ``expr`` is a SQL expression over ``values``' columns plus
    ``_score`` (the wrapped query's score — FunctionScoreQuery keeps the
    wrapped query as the MATCH set and the expression as the score,
    ``FunctionScoreQuery.java:40-47``). ``values`` supplies the
    DoubleValuesSource columns keyed by ``id_col``.
    """
    keyed = matches.withColumnRenamed("score", "_score").join(
        values, id_col
    )
    return keyed.select(
        id_col, F.expr(expr).cast("double").alias("score")
    )
