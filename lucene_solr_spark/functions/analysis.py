"""Analysis chain as a vectorized Arrow (pandas) UDF.

The Spark analog of StandardAnalyzer's pipeline
(``analysis/standard/StandardAnalyzer.java:84-96``): one scalar pandas UDF
``content → array<struct<term:string, pos:int>>`` so the whole analysis of
an Arrow batch happens in one Python call (no per-row Spark Python UDF).
The kernel is the SAME code the oracle uses
(lucene_solr_spark.oracle.tokenizer), so Spark-vs-oracle token parity is
by construction; goldens in tests/test_tokenizer.py pin the semantics.

At 100 TB scale this is the map-side-only stage: no shuffle is introduced
here; Catalyst prunes unused columns around it, and the UDF cost is the
corpus-bytes-proportional part of the build.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_solr_spark.oracle.tokenizer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH_DEFAULT,
    analyze,
)

__all__ = ["TOKEN_SCHEMA", "make_tokenize_udf", "tokenize_standard", "ENGLISH_STOP_WORDS"]

TOKEN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("pos", T.IntegerType(), False),
        ]
    )
)


def make_tokenize_udf(
    *,
    lowercase: bool = True,
    stopwords: frozenset[str] = frozenset(),
    max_token_length: int = MAX_TOKEN_LENGTH_DEFAULT,
):
    """Build a tokenizer pandas UDF with a fixed analyzer config.

    The config is captured by value in the closure (broadcast with the
    task), mirroring Lucene's per-field Analyzer binding.
    """
    stop = frozenset(stopwords)

    @F.pandas_udf(TOKEN_SCHEMA)
    def tokenize(content: pd.Series) -> pd.Series:
        return content.map(
            lambda text: [
                {"term": t, "pos": p}
                for t, p in analyze(
                    text if text is not None else "",
                    lowercase=lowercase,
                    stopwords=stop,
                    max_token_length=max_token_length,
                )
            ]
        )

    return tokenize


#: default StandardAnalyzer config (lowercase, NO stopwords —
#: StandardAnalyzer.java:51-53)
tokenize_standard = None  # initialized lazily: pandas_udf needs an active session


def get_tokenize_standard():
    global tokenize_standard
    if tokenize_standard is None:
        tokenize_standard = make_tokenize_udf()
    return tokenize_standard
