"""Pluggable similarities — formula parity + executor integration.

The kernel/SQL twin-contract: for every similarity, the numpy double
scorer and the score_sql expression must agree EXACTLY (DuckDB evaluates
the SQL), and the DF executor with the similarity plugged in must equal
the per-doc closed form computed from first principles.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_spark.functions.similarities import (
    AxiomaticF2EXP,
    BooleanSimilarity,
    ClassicSimilarity,
    DFISimilarity,
    DFRSimilarity,
    IBSimilarity,
    IndriDirichletSimilarity,
    LMDirichletSimilarity,
    LMJelinekMercerSimilarity,
    get_similarity,
)
from lucene_solr_spark.oracle import bm25

SIMS = {
    "classic": ClassicSimilarity(),
    "boolean": BooleanSimilarity(),
    "lmdirichlet": LMDirichletSimilarity(),
    "lmjelinekmercer": LMJelinekMercerSimilarity(),
    "dfr_inl2": DFRSimilarity(),
    "dfi": DFISimilarity(),
    "ib_ll": IBSimilarity(),
    "axiomatic_f2exp": AxiomaticF2EXP(),
    "indri": IndriDirichletSimilarity(),
}


def test_registry():
    assert get_similarity("classic").name == "classic"
    assert get_similarity("lmdirichlet", mu=500.0).mu == 500.0
    with pytest.raises(ValueError):
        get_similarity("bm42")
    with pytest.raises(ValueError):
        LMDirichletSimilarity(mu=-1.0)


def test_classic_formula_spot():
    """ClassicSimilarity.java:38-65: idf=ln((N+1)/(df+1))+1, tf=sqrt,
    lengthNorm=1/sqrt(len)."""
    sim = SIMS["classic"]
    w = sim.term_weight(2.0, df=9, ttf=50, doc_count=99, sum_ttf=1000)
    assert w[0] == pytest.approx(2.0 * (math.log(100 / 10) + 1.0))
    norm_byte = 7  # decodes via LENGTH_TABLE_F32
    length = float(bm25.LENGTH_TABLE_F32[norm_byte])
    s = sim.score(np.array([9]), np.array([norm_byte]), w, "double")
    assert s[0] == pytest.approx(3.0 * w[0] / math.sqrt(length))


def test_lmdirichlet_formula_spot_and_clip():
    sim = SIMS["lmdirichlet"]
    w = sim.term_weight(1.0, df=3, ttf=9, doc_count=100, sum_ttf=999)
    p = (9 + 1.0) / (999 + 1.0)
    assert w == (1.0, p)
    norm_byte = 10
    length = float(bm25.LENGTH_TABLE_F32[norm_byte])
    s = sim.score(np.array([4]), np.array([norm_byte]), w, "double")
    expect = math.log(1 + 4 / (2000.0 * p)) + math.log(2000.0 / (length + 2000.0))
    assert s[0] == pytest.approx(max(expect, 0.0))
    # a doc with fewer occurrences than the collection model predicts
    # scores 0, not negative (LMDirichletSimilarity.java:30-32,75)
    rich_p = (999_000 + 1.0) / (999_999 + 1.0)
    s2 = sim.score(np.array([1]), np.array([200]), (1.0, rich_p), "double")
    assert s2[0] == 0.0


def test_boolean_ignores_tf_and_norm():
    sim = SIMS["boolean"]
    w = sim.term_weight(3.5, 1, 1, 10, 10)
    s = sim.score(np.array([1, 100, 7]), np.array([0, 128, 255]), w, "double")
    assert s.tolist() == [3.5, 3.5, 3.5]


@pytest.mark.parametrize("name", sorted(SIMS))
def test_score_sql_equals_numpy_double(name):
    """score_sql (the oracle twin) must match the numpy double scorer for
    every norm byte and a spread of tfs — DuckDB evaluates the SQL."""
    import duckdb

    sim = SIMS[name]
    payload = sim.term_weight(1.3, df=17, ttf=60, doc_count=501, sum_ttf=25_000)
    norms = np.tile(np.arange(1, 256, dtype=np.int64), 4)
    tfs = np.repeat(np.array([1, 2, 7, 123], np.int64), 255)
    expect = sim.score(tfs, norms, payload, "double")

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({int(tf)}, {float(bm25.LENGTH_TABLE_F32[n])!r})"
            for tf, n in zip(tfs.tolist(), norms.tolist())
        )
        + ") AS v(tf, declen)"
    )
    expr = sim.score_sql(payload, tf_expr="p.tf")
    # score_sql references p.tf and n.declen — alias the table twice
    got = np.array(
        [
            r[0]
            for r in con.execute(
                f"SELECT {expr} FROM t p JOIN t n USING (tf, declen)"
            ).fetchall()
        ]
    )
    # lmdirichlet's ln() is libm-dependent (numpy SIMD log vs DuckDB
    # differ by 1 ulp on ~9% of inputs) — its cross-engine exactness
    # contract is float32, like the gate; the arithmetic-only
    # similarities must match bit-exactly in double
    if name == "lmdirichlet":
        assert np.array_equal(
            np.sort(got).astype(np.float32), np.sort(expect).astype(np.float32)
        )
    else:
        assert np.allclose(np.sort(got), np.sort(expect), rtol=0, atol=0)


def test_executor_classic_rank(spark, tiny_corpus_rows):
    """DF executor with ClassicSimilarity == per-doc closed form computed
    from the oracle analyzer stream (exact double equality)."""
    from collections import Counter

    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.oracle.tokenizer import analyze
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    ex = DFExecutor(ix, mode="double", similarity=ClassicSimilarity())

    term = "def"
    tfs, lens, dfc = {}, {}, 0
    for i, r in enumerate(tiny_corpus_rows):
        toks = [t.term for t in analyze(r["content"])]
        c = Counter(toks)
        if c[term]:
            tfs[i] = c[term]
            dfc += 1
        # length decodes through the norm byte (lossy), like the engine
        from lucene_solr_spark.oracle.smallfloat import int_to_byte4

        lens[i] = float(bm25.LENGTH_TABLE_F32[int_to_byte4(len(toks))])
    n_docs = len(tiny_corpus_rows)
    idf = math.log((n_docs + 1) / (dfc + 1)) + 1.0
    expect = {
        i: (math.sqrt(tf) * idf) / math.sqrt(lens[i]) for i, tf in tfs.items()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in ex.matches(ir.TermQuery(term)).collect()
    }
    assert set(got) == set(expect)
    for i in got:
        assert got[i] == pytest.approx(expect[i], rel=1e-12)


def test_executor_boolean_sim_counts_clauses(spark):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    ex = DFExecutor(ix, mode="double", similarity=BooleanSimilarity())
    q = ir.BooleanQuery(
        (
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("error")),
            ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("warning")),
        ),
        0,
    )
    rows = ex.matches(q).collect()
    assert rows and set(r["score"] for r in rows) <= {1.0, 2.0}
    both = ex.matches(
        ir.BooleanQuery(
            (
                ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("error")),
                ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("warning")),
            ),
            0,
        )
    ).count()
    assert sum(1 for r in rows if r["score"] == 2.0) == both


def test_lmjelinekmercer_formula_spot():
    """LMJelinekMercerSimilarity.java:55-66: interpolated LM, λ=0.1."""
    import math

    from lucene_solr_spark.oracle import bm25 as _b

    sim = SIMS["lmjelinekmercer"]
    w = sim.term_weight(1.0, df=3, ttf=9, doc_count=100, sum_ttf=999)
    p = 10.0 / 1000.0
    L = float(_b.LENGTH_TABLE_F32[10])
    s = sim.score(np.array([4]), np.array([10]), w, "double")
    assert s[0] == pytest.approx(math.log(1 + (0.9 * 4 / L) / (0.1 * p)))


def test_dfr_inl2_formula_spot():
    """DFR I(n)L2: tfn = tf·log2(1+avg/len); score = w·tfn/(tfn+1)."""
    import math

    from lucene_solr_spark.oracle import bm25 as _b

    sim = SIMS["dfr_inl2"]
    w, ca = sim.term_weight(1.0, df=9, ttf=50, doc_count=99, sum_ttf=990)
    assert w == pytest.approx(math.log2(100 / 9.5))
    assert ca == pytest.approx(10.0)
    L = float(_b.LENGTH_TABLE_F32[12])
    tfn = 3 * math.log2(1 + 10.0 / L)
    s = sim.score(np.array([3]), np.array([12]), (w, ca), "double")
    assert s[0] == pytest.approx(w * tfn / (tfn + 1))


def test_dfi_zero_below_expected():
    """DFISimilarity.java: tf at or below the expected (chance) count
    scores 0 — the independence measure only rewards surplus."""
    sim = SIMS["dfi"]
    # expected = (ttf+1)*len/(sumTtf+1); huge ttf makes e >> tf
    w = sim.term_weight(1.0, df=10, ttf=500_000, doc_count=100, sum_ttf=999_999)
    s = sim.score(np.array([2]), np.array([200]), w, "double")
    assert s[0] == 0.0


def test_indri_no_clip_negative_ok():
    """IndriDirichletSimilarity: ln((tf+μp)/(len+μ)) is NOT clipped at 0
    (unlike LMDirichlet) — rare terms in long docs go negative."""
    sim = SIMS["indri"]
    w = sim.term_weight(1.0, df=3, ttf=9, doc_count=100, sum_ttf=99_999)
    s = sim.score(np.array([1]), np.array([200]), w, "double")
    assert s[0] < 0.0


def test_axiomatic_monotone_in_tf():
    sim = SIMS["axiomatic_f2exp"]
    w = sim.term_weight(1.0, df=17, ttf=60, doc_count=501, sum_ttf=25_000)
    s = sim.score(np.array([1, 2, 10]), np.array([10, 10, 10]), w, "double")
    assert s[0] < s[1] < s[2]


def test_kernel_similarity_equals_df_executor(spark, tmp_path_factory):
    """SegmentSearcher(similarity=...) must equal DFExecutor(similarity=
    ...) — same weights (term/synonym/phrase shapes), same (tf, norm)
    scorer, exhaustive evaluation (block-max is BM25-only)."""
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.operators.segments import SegmentIndex, build_segments
    from lucene_solr_spark.operators.topk import SegmentSearcher
    from lucene_solr_spark.plans import ir
    from lucene_solr_spark.plans.df_executor import DFExecutor
    from lucene_solr_spark.sources.corpus import corpus_to_spark

    corpus = corpus_to_spark(spark, 100, seed=42, num_partitions=4)
    ix = build_index(corpus).persist()
    base = str(tmp_path_factory.mktemp("simseg"))
    build_segments(ix, base, segment_size=32)
    six = SegmentIndex.open(base)

    queries = [
        ir.TermQuery("def"),
        ir.BooleanQuery(
            (
                ir.BooleanClause(ir.Occur.MUST, ir.TermQuery("def")),
                ir.BooleanClause(ir.Occur.SHOULD, ir.TermQuery("return")),
            ),
            0,
        ),
        ir.PhraseQuery(("x", "y")),
        ir.SynonymQuery(("error", "warning")),
    ]
    for name in ("classic", "dfr_inl2", "ib_ll", "indri", "lmjelinekmercer"):
        sim = get_similarity(name)
        ker = SegmentSearcher(spark, six, mode="double", similarity=sim)
        dfe = DFExecutor(ix, mode="double", similarity=sim)
        for q in queries:
            got = [
                (r["doc_id"], r["score"])
                for r in ker.topk(q, k=10).collect()
            ]
            want = [
                (r["doc_id"], r["score"])
                for r in dfe.topk(q, k=10).select("doc_id", "score").collect()
            ]
            assert got == want, (name, q)
