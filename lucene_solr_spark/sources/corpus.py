"""Deterministic synthetic source-code corpus.

Shape per BASELINE.json input_hint / FIXTURES.md §1:
``(repo:string, path:string, commit:string, lang:string, content:string)``
plus the ``content_sha256`` per-row-invariant column.

Content is a seeded mixture of
(a) a Zipfian vocabulary of identifiers/keywords (``def``, ``class``,
    ``import``, ``return``, stopwords like ``the``/``a``/``to`` in comments),
(b) tokenizer edge cases (``foo_bar``, ``obj.method``, ``3.14``, ``utf8``,
    ``can't``, ``x!=y``, a >255-char identifier, ``"naïve"``, an emoji),
(c) lengths varying 10..~5000 tokens so norms span many SmallFloat buckets.

The generator mirrors the role of Lucene's RandomIndexWriter-based random
mini-corpora (``test-framework/.../index/RandomIndexWriter.java:44``) but is
fully deterministic (fixed seed) so docIDs — dense rank over
(repo, path, commit) — and all downstream results are reproducible at any
parallelism level.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np

__all__ = ["VOCAB", "make_corpus_rows", "corpus_to_spark", "write_corpus_parquet"]

_KEYWORDS = [
    "def", "class", "import", "return", "self", "if", "else", "for", "while",
    "try", "except", "raise", "with", "lambda", "yield", "pass", "break",
    "public", "static", "void", "int", "string", "final", "new", "null",
    "true", "false", "print", "len", "range", "list", "dict", "set",
]
_IDENTS = [
    "foo", "bar", "baz", "qux", "data", "value", "result", "index", "count",
    "buffer", "stream", "reader", "writer", "parser", "token", "node", "tree",
    "query", "score", "merge", "segment", "posting", "field", "term", "doc",
    "utf8", "sha256", "x1", "y2", "tmp", "cfg", "ctx", "env", "arg", "kwargs",
]
_COMMENT_WORDS = [
    "the", "a", "to", "of", "and", "in", "is", "it", "this", "that", "for",
    "error", "warning", "fixme", "todo", "returns", "computes", "handles",
    "fast", "slow", "empty", "cache", "thread", "safe", "copy", "deep",
]
_EDGE_CASES = [
    "foo_bar", "obj.method", "3.14", "can't", "x!=y", "a..b", "3:4",
    "1,000", "trailing.", "obj.method2", "x.y.z", "naïve", "héllo", "☃",
    "CamelCase", "snake_case_long", "HTTP2", "base64", "_private", "dunder__",
]
_LONG_IDENT = "x" * 260  # > maxTokenLength=255 → skipped but consumes a position

VOCAB = _KEYWORDS + _IDENTS
_EXTS = {"py": "python", "java": "java", "scala": "scala", "md": "markdown", "txt": "text"}


def _zipf_choice(rng: random.Random, words: list[str]) -> str:
    # Zipf-ish: rank r with prob ∝ 1/(r+1)
    n = len(words)
    weights = [1.0 / (r + 1) for r in range(n)]
    return rng.choices(words, weights=weights, k=1)[0]


def _make_content(rng: random.Random, n_tokens: int) -> str:
    parts: list[str] = []
    i = 0
    while i < n_tokens:
        roll = rng.random()
        if roll < 0.04:
            parts.append("# " + " ".join(rng.choice(_COMMENT_WORDS) for _ in range(rng.randint(3, 8))))
            i += 6
        elif roll < 0.06:
            parts.append(rng.choice(_EDGE_CASES))
            i += 1
        elif roll < 0.062:
            parts.append(_LONG_IDENT)
            i += 1
        else:
            parts.append(_zipf_choice(rng, VOCAB))
            if rng.random() < 0.3:
                parts.append("(" + rng.choice(_IDENTS) + ")")
                i += 1
            i += 1
        if rng.random() < 0.12:
            parts.append("\n")
    return " ".join(parts)


def make_corpus_rows(n_docs: int, seed: int = 42) -> list[dict]:
    """Deterministic corpus rows, sorted by the (repo, path, commit) PK."""
    rng = random.Random(seed)
    # token-length distribution: log-uniform 10..5000
    rows = []
    seen = set()
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        ext = rng.choice(list(_EXTS))
        path = f"src/dir{rng.randint(0, 40)}/file{i}.{ext}"
        commit = hashlib.sha1(f"{repo}|{path}|{seed}".encode()).hexdigest()[:12]
        key = (repo, path, commit)
        if key in seen:
            continue
        seen.add(key)
        n_tokens = int(10 * (500 ** rng.random()))  # 10..5000 log-uniform
        content = _make_content(rng, n_tokens)
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": _EXTS[ext],
                "content": content,
                "content_sha256": hashlib.sha256(content.encode("utf-8")).hexdigest(),
            }
        )
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    return rows


def corpus_to_spark(spark, n_docs: int, seed: int = 42, num_partitions: int | None = None):
    """Corpus as a Spark DataFrame (no docIDs yet — assignment is the
    engine's job, operators.index_build.assign_doc_ids)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
            T.StructField("content", T.StringType(), False),
            T.StructField("content_sha256", T.StringType(), False),
        ]
    )
    rows = make_corpus_rows(n_docs, seed)
    df = spark.createDataFrame(rows, schema=schema)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def corpus_distributed(spark, n_docs: int, seed: int = 42, num_partitions: int | None = None):
    """Distributed deterministic corpus: content derives from the doc index
    alone (per-row seeded RNG), so ANY partitioning yields identical rows —
    the generator scales with the cluster instead of the driver (the
    benchmark corpus path; driver-side make_corpus_rows stays for tiny
    test fixtures)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("idx", T.LongType(), False),
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
            T.StructField("content", T.StringType(), False),
            T.StructField("content_sha256", T.StringType(), False),
        ]
    )

    def gen(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"].tolist():
                rng = random.Random((seed << 32) ^ i)
                repo = f"org{i % 7}/repo{i % 23}"
                ext = rng.choice(list(_EXTS))
                path = f"src/dir{rng.randint(0, 40)}/file{i}.{ext}"
                commit = hashlib.sha1(f"{repo}|{path}|{seed}".encode()).hexdigest()[:12]
                n_tokens = int(10 * (500 ** rng.random()))
                content = _make_content(rng, n_tokens)
                rows.append(
                    {
                        "idx": i,
                        "repo": repo,
                        "path": path,
                        "commit": commit,
                        "lang": _EXTS[ext],
                        "content": content,
                        "content_sha256": hashlib.sha256(
                            content.encode("utf-8")
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    parts = num_partitions or spark.sparkContext.defaultParallelism
    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=schema)
        .drop("idx")
    )


def write_corpus_parquet(spark, out_dir: str, n_docs: int, seed: int = 42) -> str:
    corpus_to_spark(spark, n_docs, seed).write.mode("overwrite").parquet(out_dir)
    return out_dir


def corpus_token_lengths(n_docs: int, seed: int = 42) -> np.ndarray:
    """Diagnostic: token counts per doc (for norm-bucket coverage checks)."""
    from lucene_solr_spark.oracle.tokenizer import analyze

    return np.array([len(analyze(r["content"])) for r in make_corpus_rows(n_docs, seed)])
