"""Lucene-exact float32 BM25 kernel (numpy).

Semantics parity with the reference
``lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java``:

- ``idf = (float) ln(1 + (docCount - df + 0.5) / (df + 0.5))`` computed in
  double, cast once to float32 (``:104-107``).
- multi-term (synonym/phrase) idf: per-term float32 idfs summed in a
  DOUBLE, then cast once to float32 (``:191-199``).
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)`` (``:114-117``).
- per-query cache over the 256 norm bytes, float32 arithmetic in Java
  evaluation order ``1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))``
  (``:211-214``).
- ``weight = boost * idf`` — float32, note NO (k1+1) numerator (``:242``).
- ``score = weight - weight / (1f + freq * cache[norm & 0xFF])`` with every
  op in float32, in this order (``:246-258``).
- norm byte = ``SmallFloat.intToByte4(length - numOverlap)``,
  discountOverlaps=true default (``:138-148``).

Boolean combination semantics (see oracle.engine):
- conjunction / disjunction-sum / WAND accumulate the per-clause float32
  scores in a DOUBLE and cast the total once to float32
  (``search/ConjunctionScorer.java:59-64``,
  ``search/DisjunctionSumScorer.java:38-44``,
  ``search/WANDScorer.java:518-525``).
- req+opt adds opt to req in FLOAT (``search/ReqOptSumScorer.java:260-277``).

numpy float32 scalar/array ops round-to-nearest per operation exactly like
Java floats (no FMA contraction in numpy ufuncs), which the bit-parity
tests in tests/test_bm25.py pin down.
"""

from __future__ import annotations

import math

import numpy as np

from lucene_solr_spark.oracle.smallfloat import LENGTH_TABLE

__all__ = [
    "K1_DEFAULT",
    "B_DEFAULT",
    "LENGTH_TABLE_F32",
    "idf",
    "idf_sum",
    "avg_field_length",
    "norm_inverse_cache",
    "score",
    "max_block_score",
]

K1_DEFAULT = 1.2
B_DEFAULT = 0.75

#: float32 view of the SmallFloat decode table (BM25Similarity.java:129-135)
LENGTH_TABLE_F32 = LENGTH_TABLE.astype(np.float32)


def idf(df: int, doc_count: int) -> np.float32:
    """float32 idf of one term; inner math in double (Java Math.log)."""
    return np.float32(math.log(1.0 + (doc_count - df + 0.5) / (df + 0.5)))


def idf_sum(dfs, doc_count: int) -> np.float32:
    """Multi-term idf: float32 per-term idfs accumulated in double."""
    acc = 0.0  # double accumulator (BM25Similarity.java:192-198)
    for df in dfs:
        acc += float(idf(df, doc_count))
    return np.float32(acc)


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_inverse_cache(k1: float, b: float, avgdl: np.float32) -> np.ndarray:
    """256-entry float32 cache: 1f / (k1 * ((1-b) + b * len[i] / avgdl))."""
    k1f = np.float32(k1)
    bf = np.float32(b)
    one = np.float32(1.0)
    # Java evaluation order: ((1 - b) + ((b * LENGTH_TABLE[i]) / avgdl))
    inner = (one - bf) + (bf * LENGTH_TABLE_F32) / np.float32(avgdl)
    return (one / (k1f * inner)).astype(np.float32)


def score(
    freq,
    norm_bytes,
    *,
    weight: np.float32,
    cache: np.ndarray,
):
    """Vectorized float32 term score: weight - weight / (1 + freq * cache[n]).

    ``freq``: int or array of term frequencies (converted to float32 like
    Java's implicit int→float); ``norm_bytes``: unsigned norm byte(s).
    """
    f = np.asarray(freq, dtype=np.float32)
    n = np.asarray(norm_bytes, dtype=np.uint8)
    w = np.float32(weight)
    one = np.float32(1.0)
    return (w - w / (one + f * cache[n])).astype(np.float32)


def term_weight(boost: float, idf_value: np.float32) -> np.float32:
    """weight = boost * idf, float32 (BM25Similarity.java:242)."""
    return np.float32(np.float32(boost) * np.float32(idf_value))


def max_block_score(impacts, *, weight: np.float32, cache: np.ndarray) -> np.float32:
    """Max possible score over a block's (freq, norm) impact frontier.

    Mirrors MaxScoreCache.computeMaxScore
    (``search/MaxScoreCache.java:58-71``): the max of score(freq, norm)
    over the competitive (freq, norm) pairs.
    """
    best = np.float32(0.0)
    for freq, norm in impacts:
        s = score(freq, norm, weight=weight, cache=cache)
        if s > best:
            best = np.float32(s)
    return best
