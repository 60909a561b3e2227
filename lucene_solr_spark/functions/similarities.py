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
    "LMJelinekMercerSimilarity",
    "DFRSimilarity",
    "DFISimilarity",
    "IBSimilarity",
    "AxiomaticF2EXP",
    "IndriDirichletSimilarity",
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


def _score_pairs(tfs, norms, scalar_fn, mode):
    """Vectorize a scalar (tf, declen) → score function over a batch via
    the distinct-pair LUT (distinct tfs are few, declen has ≤256 values).
    The scalar runs PYTHON math.* ops in the exact textual order of the
    similarity's score_sql — both call the platform libm, so the double
    chain is bit-identical to the DuckDB oracle (see LMDirichlet note)."""
    tfs64 = np.asarray(tfs, np.float64)
    lens = _declen(np.asarray(norms, np.int64)).astype(np.float64)
    pairs = np.stack([tfs64, lens], axis=1)
    u, inv = np.unique(pairs, axis=0, return_inverse=True)
    vals = np.array([scalar_fn(t, L) for t, L in u.tolist()], np.float64)
    s = vals[inv]
    return s.astype(np.float32) if mode == "float32" else s


def _d(v: float) -> str:
    """SQL double literal: DuckDB parses bare numeric literals as
    DECIMAL, whose exact decimal arithmetic diverges from the engine's
    IEEE double chain — cast every payload constant explicitly."""
    return f"({v!r}::DOUBLE)"


class LMJelinekMercerSimilarity(Similarity):
    """``similarities/LMJelinekMercerSimilarity.java:55-66``: score =
    boost · ln(1 + ((1−λ)·tf/len) / (λ·p)), p = (ttf+1)/(sumTtf+1)."""

    def __init__(self, lam: float = 0.1):
        if not (0.0 < lam <= 1.0):
            raise ValueError(f"illegal lambda value: {lam}")
        object.__setattr__(self, "name", "lmjelinekmercer")
        object.__setattr__(self, "_lam", float(lam))

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        return (float(boost), (ttf + 1.0) / (sum_ttf + 1.0))

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        ttf = sum(t for _, t in stats)
        return (float(boost), (ttf + 1.0) / (sum_ttf + 1.0))

    def score(self, tfs, norms, payload, mode):
        boost, p = payload
        lam = self._lam

        def f(tf, L):
            return boost * math.log(1.0 + (((1.0 - lam) * tf) / L) / (lam * p))

        return _score_pairs(tfs, norms, f, mode)

    def score_sql(self, payload, tf_expr="p.tf"):
        boost, p = payload
        lam = self._lam
        return (
            f"({_d(boost)} * ln(1.0 + (({_d(1.0 - lam)} * {tf_expr}::DOUBLE)"
            f" / n.declen) / ({_d(lam)} * {_d(p)})))"
        )


class DFRSimilarity(Similarity):
    """DFR I(n)L2 (``similarities/DFRSimilarity.java`` with
    ``BasicModelIn.java`` + ``AfterEffectL.java`` + ``NormalizationH2.java``;
    Amati & van Rijsbergen 2002): tfn = tf·log2(1 + c·avgLen/len), score =
    boost·log2((N+1)/(df+0.5)) · tfn/(tfn+1)."""

    def __init__(self, c: float = 1.0):
        if not (math.isfinite(c) and c > 0):
            raise ValueError(f"illegal c value: {c}")
        object.__setattr__(self, "name", "dfr_inl2")
        object.__setattr__(self, "_c", float(c))

    def _w(self, boost, df, doc_count):
        return float(boost) * (
            math.log((doc_count + 1.0) / (df + 0.5)) / math.log(2.0)
        )

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        avg = sum_ttf / doc_count if doc_count else 1.0
        return (self._w(boost, df, doc_count), self._c * avg)

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        # synonym shape: df = max over variants (SynonymQuery contract)
        df = max((d for d, _ in stats), default=0)
        avg = sum_ttf / doc_count if doc_count else 1.0
        return (self._w(boost, df, doc_count), self._c * avg)

    def score(self, tfs, norms, payload, mode):
        w, ca = payload

        def f(tf, L):
            tfn = tf * (math.log(1.0 + ca / L) / math.log(2.0))
            return (w * tfn) / (tfn + 1.0)

        return _score_pairs(tfs, norms, f, mode)

    def score_sql(self, payload, tf_expr="p.tf"):
        w, ca = payload
        tfn = f"({tf_expr}::DOUBLE * (ln(1.0 + {_d(ca)} / n.declen) / ln(2.0)))"
        return f"(({_d(w)} * {tfn}) / ({tfn} + 1.0))"


class DFISimilarity(Similarity):
    """``similarities/DFISimilarity.java:44-60`` with the chi-squared
    independence measure (``IndependenceChiSquared.java``): expected =
    (ttf+1)·len/(sumTtf+1); score = 0 when tf ≤ expected, else
    boost·log2((tf−expected)²/expected + 1)."""

    def __init__(self):
        object.__setattr__(self, "name", "dfi")

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        return (float(boost), ttf + 1.0, sum_ttf + 1.0)

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        ttf = sum(t for _, t in stats)
        return (float(boost), ttf + 1.0, sum_ttf + 1.0)

    def score(self, tfs, norms, payload, mode):
        boost, ttf1, sttf1 = payload

        def f(tf, L):
            e = (ttf1 * L) / sttf1
            if tf <= e:
                return 0.0
            return boost * (math.log(((tf - e) * (tf - e)) / e + 1.0) / math.log(2.0))

        return _score_pairs(tfs, norms, f, mode)

    def score_sql(self, payload, tf_expr="p.tf"):
        boost, ttf1, sttf1 = payload
        e = f"(({_d(ttf1)} * n.declen) / {_d(sttf1)})"
        tf = f"{tf_expr}::DOUBLE"
        return (
            f"(CASE WHEN {tf} <= {e} THEN 0.0 ELSE {_d(boost)} * "
            f"(ln((({tf} - {e}) * ({tf} - {e})) / {e} + 1.0) / ln(2.0)) END)"
        )


class IBSimilarity(Similarity):
    """IB LL·DF·H2 (``similarities/IBSimilarity.java`` with
    ``DistributionLL.java`` + ``LambdaDF.java`` + ``NormalizationH2.java``;
    Clinchant & Gaussier 2010): λ = (df+1)/(N+1), tfn as H2, score =
    boost · −ln(λ/(tfn+λ))."""

    def __init__(self, c: float = 1.0):
        if not (math.isfinite(c) and c > 0):
            raise ValueError(f"illegal c value: {c}")
        object.__setattr__(self, "name", "ib_ll")
        object.__setattr__(self, "_c", float(c))

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        avg = sum_ttf / doc_count if doc_count else 1.0
        lam = (df + 1.0) / (doc_count + 1.0)
        return (float(boost), lam, self._c * avg)

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        df = max((d for d, _ in stats), default=0)
        avg = sum_ttf / doc_count if doc_count else 1.0
        return (float(boost), (df + 1.0) / (doc_count + 1.0), self._c * avg)

    def score(self, tfs, norms, payload, mode):
        boost, lam, ca = payload

        def f(tf, L):
            tfn = tf * (math.log(1.0 + ca / L) / math.log(2.0))
            return boost * -math.log(lam / (tfn + lam))

        return _score_pairs(tfs, norms, f, mode)

    def score_sql(self, payload, tf_expr="p.tf"):
        boost, lam, ca = payload
        tfn = f"({tf_expr}::DOUBLE * (ln(1.0 + {_d(ca)} / n.declen) / ln(2.0)))"
        return f"({_d(boost)} * -ln({_d(lam)} / ({tfn} + {_d(lam)})))"


class AxiomaticF2EXP(Similarity):
    """``similarities/AxiomaticF2EXP.java`` (Fang & Zhai 2005): score =
    boost·((N+1)/df)^k · tf/(tf + s + (s·len)/avgLen), s=0.5, k=0.35."""

    def __init__(self, s: float = 0.5, k: float = 0.35):
        if not (0.0 <= s <= 1.0 and 0.0 < k <= 1.0):
            raise ValueError(f"illegal s/k values: {s}, {k}")
        object.__setattr__(self, "name", "axiomatic_f2exp")
        object.__setattr__(self, "_s", float(s))
        object.__setattr__(self, "_k", float(k))

    def _w(self, boost, df, doc_count):
        return float(boost) * math.pow(
            (doc_count + 1.0) / max(df, 1), self._k
        )

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        avg = sum_ttf / doc_count if doc_count else 1.0
        return (self._w(boost, df, doc_count), avg)

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        df = max((d for d, _ in stats), default=0)
        avg = sum_ttf / doc_count if doc_count else 1.0
        return (self._w(boost, df, doc_count), avg)

    def score(self, tfs, norms, payload, mode):
        w, avg = payload
        s = self._s

        def f(tf, L):
            return w * (tf / (tf + s + (s * L) / avg))

        return _score_pairs(tfs, norms, f, mode)

    def score_sql(self, payload, tf_expr="p.tf"):
        w, avg = payload
        s = self._s
        tf = f"{tf_expr}::DOUBLE"
        return (
            f"({_d(w)} * ({tf} / ({tf} + {_d(s)} +"
            f" ({_d(s)} * n.declen) / {_d(avg)})))"
        )


class IndriDirichletSimilarity(Similarity):
    """``similarities/IndriDirichletSimilarity.java``: Indri's Dirichlet
    variant — score = boost · ln((tf + μ·p)/(len + μ)), NO zero clip,
    p = (ttf+1)/(sumTtf+1)."""

    def __init__(self, mu: float = 2000.0):
        if not (math.isfinite(mu) and mu >= 0):
            raise ValueError(f"illegal mu value: {mu}")
        object.__setattr__(self, "name", "indri")
        object.__setattr__(self, "_mu", float(mu))

    def term_weight(self, boost, df, ttf, doc_count, sum_ttf):
        return (float(boost), (ttf + 1.0) / (sum_ttf + 1.0))

    def sum_weight(self, boost, stats, doc_count, sum_ttf):
        ttf = sum(t for _, t in stats)
        return (float(boost), (ttf + 1.0) / (sum_ttf + 1.0))

    def score(self, tfs, norms, payload, mode):
        boost, p = payload
        mu = self._mu

        def f(tf, L):
            return boost * math.log((tf + mu * p) / (L + mu))

        return _score_pairs(tfs, norms, f, mode)

    def score_sql(self, payload, tf_expr="p.tf"):
        boost, p = payload
        mu = self._mu
        return (
            f"({_d(boost)} * ln(({tf_expr}::DOUBLE + {_d(mu)} * {_d(p)})"
            f" / (n.declen + {_d(mu)})))"
        )


_REGISTRY = {
    "classic": ClassicSimilarity,
    "boolean": BooleanSimilarity,
    "lmdirichlet": LMDirichletSimilarity,
    "lmjelinekmercer": LMJelinekMercerSimilarity,
    "dfr_inl2": DFRSimilarity,
    "dfi": DFISimilarity,
    "ib_ll": IBSimilarity,
    "axiomatic_f2exp": AxiomaticF2EXP,
    "indri": IndriDirichletSimilarity,
}


def get_similarity(name: str, **kwargs) -> Similarity:
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown similarity {name!r}; available: {sorted(_REGISTRY)} "
            "(bm25 is the executors' built-in default)"
        )
    return _REGISTRY[name](**kwargs)
