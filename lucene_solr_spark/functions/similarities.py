"""Pluggable similarities beyond BM25 — ``search/similarities/*``.

Each similarity supplies (a) a per-term WEIGHT PAYLOAD computed from
collection statistics at plan time, and (b) vectorized scoring of
``(tf, norm_byte)`` pairs — the ``SimScorer.score(freq, norm)`` contract
(``Similarity.java:143``). Norm bytes are the shared SmallFloat byte4
length encoding all Lucene similarities read (``TFIDFSimilarity.java:
467-473``, ``SimilarityBase`` LENGTH_TABLE), so every similarity here
scores the SAME index — no reindex to switch, exactly like the reference.

Shipped formulas (reference file:line in each class):

- ClassicSimilarity (TF-IDF): score = sqrt(tf) · boost·idf · 1/sqrt(len)
- BooleanSimilarity:          score = boost
- LMDirichletSimilarity:      score = max(0, boost·(ln(1 + tf/(μ·p)) +
                               ln(μ/(len+μ)))), p = (ttf+1)/(sumTtf+1)

Composition semantics (sums over boolean clauses, df=max/ttf=sum for
synonyms, summed weights for phrases) follow the reference's
query-level scorers, which are similarity-agnostic.

Two modes, mirroring the executors: "float32" computes the reference's
float chain with numpy float32 ops; "double" is the pure-double form the
DuckDB ANSI-SQL oracles reproduce exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_solr_spark.oracle import bm25

__all__ = [
    "Similarity",
    "ClassicSimilarity",
    "BooleanSimilarity",
    "LMDirichletSimilarity",
    "get_similarity",
]


def _declen(norms: np.ndarray) -> np.ndarray:
    """Decoded float32 field length per norm byte (LENGTH_TABLE role)."""
    return bm25.LENGTH_TABLE_F32[np.asarray(norms, np.int64)]


@dataclass(frozen=True)
class Similarity:
    """Base contract. ``weight`` payloads are plain tuples of floats so
    compiled plans stay JSON-serializable (plan-dedupe requirement)."""

    name: str = "base"

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        raise NotImplementedError

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        """Aggregated weight for synonym/phrase shapes: ``stats`` is a
        list of (df, ttf) — df semantics = max, ttf = sum (SynonymQuery),
        idf-like weights sum (PhraseWeight)."""
        raise NotImplementedError

    def score(self, tfs, norms, payload, mode):
        raise NotImplementedError

    def score_sql(self, payload, tf_expr="p.tf") -> str:
        """Double-precision ANSI-SQL expression over (tf, n.declen) —
        the oracle twin of ``score(..., mode='double')``."""
        raise NotImplementedError


class ClassicSimilarity(Similarity):
    """``similarities/ClassicSimilarity.java:38-65`` + TFIDFScorer
    (``TFIDFSimilarity.java:481-502``): idf = ln((N+1)/(df+1)) + 1,
    tf = sqrt(freq), lengthNorm = 1/sqrt(len) with the byte-0 special
    case normTable[0] = 1/normTable[255]."""

    def __init__(self):
        object.__setattr__(self, "name", "classic")

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        idf = math.log((doc_count + 1) / (df + 1)) + 1.0
        return (float(boost) * idf,)

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        # PhraseWeight: idf sums over terms (TFIDFSimilarity.idfExplain
        # over TermStatistics[]); SynonymQuery passes df=max which the
        # caller folds into stats already
        s = sum(math.log((doc_count + 1) / (df + 1)) + 1.0 for df, _ in stats)
        return (float(boost) * s,)

    def _norm_values(self):
        lens = bm25.LENGTH_TABLE_F32.astype(np.float64).copy()
        vals = np.zeros(256)
        vals[1:] = 1.0 / np.sqrt(lens[1:])
        vals[0] = 1.0 / vals[255]  # TFIDFSimilarity.java:473
        return vals

    def score(self, tfs, norms, payload, mode):
        (w,) = payload
        vals = self._norm_values()
        if mode == "float32":
            raw = np.sqrt(tfs.astype(np.float32)) * np.float32(w)
            return (raw * vals.astype(np.float32)[np.asarray(norms, np.int64)]).astype(
                np.float32
            )
        return (
            np.sqrt(tfs.astype(np.float64)) * w
        ) * vals[np.asarray(norms, np.int64)]

    def score_sql(self, payload, tf_expr="p.tf"):
        (w,) = payload
        # byte 0 (length 0) cannot occur for a doc that CONTAINS the
        # term, so the plain 1/sqrt(declen) form is exact for scoring
        return f"(sqrt({tf_expr}::DOUBLE) * {w!r}) * (1.0 / sqrt(n.declen))"


class BooleanSimilarity(Similarity):
    """``similarities/BooleanSimilarity.java:29-55``: score = boost,
    frequency and length are ignored."""

    def __init__(self):
        object.__setattr__(self, "name", "boolean")

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        return (float(boost),)

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        return (float(boost),)

    def score(self, tfs, norms, payload, mode):
        (w,) = payload
        dt = np.float32 if mode == "float32" else np.float64
        return np.full(len(tfs), w, dt)

    def score_sql(self, payload, tf_expr="p.tf"):
        (w,) = payload
        return f"({w!r}::DOUBLE)"


class LMDirichletSimilarity(Similarity):
    """``similarities/LMDirichletSimilarity.java:70-76``: score =
    boost · (ln(1 + tf/(μ·p)) + ln(μ/(len+μ))), clipped at 0; collection
    probability p = (ttf+1)/(sumTtf+1) (LMSimilarity
    DefaultCollectionModel). Aggregated shapes use summed ttf."""

    def __init__(self, mu: float = 2000.0):
        if not (math.isfinite(mu) and mu >= 0):
            raise ValueError(f"illegal mu value: {mu}")
        object.__setattr__(self, "name", "lmdirichlet")
        object.__setattr__(self, "_mu", float(mu))

    @property
    def mu(self) -> float:
        return self._mu

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        return (float(boost), p)

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        ttf = sum(t for _, t in stats)
        return (float(boost), (ttf + 1.0) / (sum_ttf + 1.0))

    def score(self, tfs, norms, payload, mode):
        boost, p = payload
        mu = self._mu
        tfs = np.asarray(tfs)
        norms = np.asarray(norms, np.int64)
        # log via LIBM (math.log) over the DISTINCT tf / norm values, not
        # numpy's SIMD log: numpy rounds differently by 1 ulp on ~9% of
        # inputs, which would break bit-equality with the DuckDB oracle
        # (both DuckDB and math.log call the platform libm). The two log
        # terms depend only on tf and on the norm byte respectively, so
        # two small LUTs cover any batch.
        utf, inv_t = np.unique(tfs.astype(np.float64), return_inverse=True)
        a = np.array([math.log(1.0 + t / (mu * p)) for t in utf.tolist()])
        lens = _declen(norms).astype(np.float64)
        ulen, inv_l = np.unique(lens, return_inverse=True)
        b = np.array([math.log(mu / (L + mu)) for L in ulen.tolist()])
        s = boost * (a[inv_t] + b[inv_l])
        s = np.maximum(s, 0.0)
        return s.astype(np.float32) if mode == "float32" else s

    def score_sql(self, payload, tf_expr="p.tf"):
        boost, p = payload
        mu = self._mu
        return (
            f"greatest(0.0, {boost!r} * (ln(1.0 + {tf_expr}::DOUBLE / "
            f"({mu!r} * {p!r})) + ln({mu!r} / (n.declen + {mu!r}))))"
        )


_REGISTRY = {
    "classic": ClassicSimilarity,
    "boolean": BooleanSimilarity,
    "lmdirichlet": LMDirichletSimilarity,
}


def get_similarity(name: str, **kwargs) -> Similarity:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown similarity {name!r}; available: {sorted(_REGISTRY)} "
            "(bm25 is the executors' built-in default)"
        )
    return _REGISTRY[name](**kwargs)
