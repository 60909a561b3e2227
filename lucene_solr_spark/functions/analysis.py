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


def tokens_frame(
    docs: "DataFrame",  # noqa: F821
    *,
    text_col: str,
    id_col: str = "doc_id",
    lowercase: bool = True,
    stopwords: frozenset[str] = frozenset(),
    max_token_length: int = MAX_TOKEN_LENGTH_DEFAULT,
):
    """corpus → flat (doc_id, term, pos) token rows via ONE ``mapInPandas``
    pass — the fast path for index builds.

    Emitting columnar Arrow batches directly avoids materializing millions
    of per-token Python structs that the scalar array<struct> UDF +
    ``explode`` shape pays for (~10× less conversion overhead at equal
    tokenizer cost). The scalar UDF (``make_tokenize_udf``) remains the
    per-document API used by parity tests."""
    import numpy as np

    stop = frozenset(stopwords)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("pos", T.IntegerType(), False),
        ]
    )

    def fn(iterator):
        for pdf in iterator:
            ids: list[np.ndarray] = []
            terms: list[str] = []
            poss: list[np.ndarray] = []
            for doc_id, text in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                toks = analyze(
                    text if text is not None else "",
                    lowercase=lowercase,
                    stopwords=stop,
                    max_token_length=max_token_length,
                )
                if not toks:
                    continue
                terms.extend(t.term for t in toks)
                poss.append(np.fromiter((t.pos for t in toks), np.int32, len(toks)))
                ids.append(np.full(len(toks), doc_id, np.int64))
            if not ids:
                yield pd.DataFrame({"doc_id": [], "term": [], "pos": []}).astype(
                    {"doc_id": "int64", "term": "object", "pos": "int32"}
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids),
                    "term": terms,
                    "pos": np.concatenate(poss),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema=schema)


def postings_frame(
    docs: "DataFrame",  # noqa: F821
    *,
    text_col: str,
    id_col: str = "doc_id",
    lowercase: bool = True,
    stopwords: frozenset[str] = frozenset(),
    max_token_length: int = MAX_TOKEN_LENGTH_DEFAULT,
    with_positions: bool = True,
):
    """corpus → (doc_id, term, tf, positions) posting rows, inverted
    MAP-SIDE in one ``mapInPandas`` pass — Lucene's DWPT in-memory
    inversion (``index/TermsHashPerField.java:132-154``): a (term, doc)
    posting lives entirely inside one document, so no token-level shuffle
    is ever needed. The only wide shuffles in an index build are the ones
    the LAYOUT needs (doc-range repartition for segments), not the
    inversion itself — at 100 TB that removes the dominant all-to-all
    exchange of individual token rows."""
    import numpy as np

    stop = frozenset(stopwords)
    fields = [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.LongType(), False),
    ]
    if with_positions:
        fields.append(T.StructField("positions", T.ArrayType(T.IntegerType()), True))
    schema = T.StructType(fields)

    def fn(iterator):
        cols = [f.name for f in fields]
        for pdf in iterator:
            out_id: list[int] = []
            out_term: list[str] = []
            out_tf: list[int] = []
            out_pos: list[list[int]] = []
            for doc_id, text in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                toks = analyze(
                    text if text is not None else "",
                    lowercase=lowercase,
                    stopwords=stop,
                    max_token_length=max_token_length,
                )
                if not toks:
                    continue
                inv: dict[str, list[int]] = {}
                for t in toks:
                    inv.setdefault(t.term, []).append(t.pos)
                out_id.extend([doc_id] * len(inv))
                for term, plist in inv.items():
                    out_term.append(term)
                    out_tf.append(len(plist))
                    if with_positions:
                        out_pos.append(plist)
            data = {
                "doc_id": np.asarray(out_id, np.int64),
                "term": out_term,
                "tf": np.asarray(out_tf, np.int64),
            }
            if with_positions:
                data["positions"] = out_pos
            yield pd.DataFrame(data, columns=cols)

    return docs.select(id_col, text_col).mapInPandas(fn, schema=schema)
