"""Classification module (lucene/classification): SimpleNaiveBayes and
KNearestNeighbor classifiers vs scalar re-implementations of the
reference math (TestSimpleNaiveBayesClassifier / TestKNearestNeighbor
model)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.classification import (
    knn_classes,
    naive_bayes_classify,
    naive_bayes_train,
)


def _cls_of(i: int) -> str:
    return f"c{i % 3}"


@pytest.fixture(scope="module")
def trained(spark, tiny_corpus_rows):
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(tiny_corpus_rows)],
        "doc_id: long, text: string",
    )
    ix = build_index(docs, text_col="text", doc_id_col="doc_id").persist()
    classes = spark.createDataFrame(
        [(i, _cls_of(i)) for i in range(len(tiny_corpus_rows))],
        "doc_id: long, cls: string",
    )
    model = naive_bayes_train(ix.postings_slim, classes)
    return DFExecutor(ix, mode="double"), classes, model


def _scalar_nb(tiny_oracle, classes: dict[int, str], tokens: list[str]):
    """SimpleNaiveBayesClassifier.java:137-325 re-done with dicts,
    including the engine's pinned determinism contract (per-term
    contributions and exp addends rounded to float32 before the double
    sum, making the distributed aggregation order-independent)."""
    from collections import Counter

    import numpy as np

    docs_with_class = len(classes)
    # wdf[c][w] = #docs of class c containing w
    by_class_docs: dict[str, set[int]] = {}
    for d, c in classes.items():
        by_class_docs.setdefault(c, set()).add(d)
    n_postings = sum(len(p) for p in tiny_oracle.postings.values())
    # sumDocFreq / docCount of the text FIELD (the whole reader)
    field_docs = set()
    for p in tiny_oracle.postings.values():
        field_docs.update(p)
    avg_unique = n_postings / len(field_docs)
    raw = {}
    for c, cdocs in by_class_docs.items():
        prior = math.log(len(cdocs)) - math.log(docs_with_class)
        den = avg_unique * len(cdocs) + docs_with_class
        ll = 0.0
        for w, r in Counter(tokens).items():
            hits = len(
                [d for d in tiny_oracle.postings.get(w, ()) if d in cdocs]
            )
            ll += float(np.float32(r * math.log((hits + 1) / den)))
        raw[c] = prior + ll
    # normClassificationResults
    smax = max(raw.values())
    loga = smax + math.log(
        sum(float(np.float32(math.exp(v - smax))) for v in raw.values())
    )
    # final scores round to f32 (engine determinism contract)
    return {c: float(np.float32(math.exp(v - loga))) for c, v in raw.items()}


def test_nb_matches_scalar_reference(spark, trained, tiny_oracle):
    ex, classes, model = trained
    inputs = ex.index.postings_slim.filter(F.col("doc_id") < 15).select(
        F.col("doc_id").alias("id"), "term", "tf"
    )
    got = {
        (r.id, r.cls): r.score
        for r in naive_bayes_classify(model, inputs).collect()
    }
    cls_map = {i: _cls_of(i) for i in range(tiny_oracle.doc_count)}
    from lucene_solr_spark.oracle.tokenizer import analyze

    for d in range(15):
        # reconstruct the token multiset from the oracle postings
        toks = []
        for t, posting in tiny_oracle.postings.items():
            toks.extend([t] * posting.get(d, 0))
        want = _scalar_nb(tiny_oracle, cls_map, toks)
        for c, v in want.items():
            assert got[(d, c)] == pytest.approx(v, rel=1e-9), (d, c)


def test_nb_scores_normalize_to_one(spark, trained):
    ex, classes, model = trained
    inputs = ex.index.postings_slim.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("id"), "term", "tf"
    )
    sums = (
        naive_bayes_classify(model, inputs)
        .groupBy("id")
        .agg(F.sum("score").alias("s"))
        .collect()
    )
    assert len(sums) == 10
    for r in sums:
        # exp addends are float32-rounded (determinism contract), so the
        # partition sums to 1 within f32 precision
        assert r.s == pytest.approx(1.0, rel=1e-6)


def test_nb_unseen_words_use_smoothing(spark, trained):
    ex, classes, model = trained
    inputs = spark.createDataFrame(
        [(99999, "zzzunseenzzz", 3)], "id: long, term: string, tf: long"
    )
    rows = naive_bayes_classify(model, inputs, normalize=False).collect()
    # every class still gets a finite score: prior + 3·ln(1/den)
    assert len(rows) == 3
    stats = {r.cls: (r.prior, r.den) for r in model.class_stats.collect()}
    for r in rows:
        prior, den = stats[r.cls]
        want = prior + float(
            __import__("numpy").float32(3.0 * math.log(1.0 / den))
        )
        assert r.score == pytest.approx(want, rel=1e-12)


def test_knn_vote_matches_topdocs_math(spark, trained):
    from lucene_solr_spark.functions.mlt import mlt_topk

    ex, classes, model = trained
    top = mlt_topk(ex, 3, k=10, boost=True, min_term_freq=1, min_doc_freq=2).collect()
    assert len(top) == 10
    max_score = top[0].score
    counts: dict[str, int] = {}
    boosts: dict[str, float] = {}
    for r in top:
        c = _cls_of(r.doc_id)
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + float(np.float32(r.score / max_score))
    want = {c: boosts[c] / 10.0 for c in counts}  # sumdoc == k
    got = {r.cls: r.score for r in knn_classes(ex, classes, 3, k=10, min_term_freq=1, min_doc_freq=2).collect()}
    assert set(got) == set(want)
    for c in want:
        assert got[c] == pytest.approx(want[c], rel=1e-12)


def test_knn_sumdoc_correction(spark, trained):
    """When neighbors lack a class value, scores scale by k/sumdoc
    (KNearestNeighborClassifier.java:222-232)."""
    from lucene_solr_spark.functions.mlt import mlt_topk

    ex, classes, model = trained
    top = mlt_topk(ex, 3, k=10, boost=True, min_term_freq=1, min_doc_freq=2).collect()
    keep = {r.doc_id for r in top[:6]}  # declass 4 of the 10 neighbors
    classes2 = classes.withColumn(
        "cls",
        F.when(
            F.col("doc_id").isin([int(d) for d in keep])
            | ~F.col("doc_id").isin([int(r.doc_id) for r in top]),
            F.col("cls"),
        ),
    )
    got = {
        r.cls: r.score for r in knn_classes(ex, classes2, 3, k=10, min_term_freq=1, min_doc_freq=2).collect()
    }
    max_score = top[0].score
    counts: dict[str, int] = {}
    boosts: dict[str, float] = {}
    for r in top:
        if r.doc_id not in keep:
            continue
        c = _cls_of(r.doc_id)
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + float(np.float32(r.score / max_score))
    sumdoc = sum(counts.values())
    want = {c: (boosts[c] / 10.0) * (10.0 / sumdoc) for c in counts}
    assert set(got) == set(want)
    for c in want:
        assert got[c] == pytest.approx(want[c], rel=1e-12)


def test_knn_boost_changes_ranking_inputs(spark, trained):
    """setBoost(true) actually weights terms: boosted and unboosted MLT
    score columns differ."""
    from lucene_solr_spark.functions.mlt import mlt_topk

    ex, classes, model = trained
    a = {r.doc_id: r.score for r in mlt_topk(ex, 3, k=10, boost=True, min_term_freq=1, min_doc_freq=2).collect()}
    b = {r.doc_id: r.score for r in mlt_topk(ex, 3, k=10, min_term_freq=1, min_doc_freq=2).collect()}
    assert any(
        a[d] != b[d] for d in set(a) & set(b)
    ), "boosted weights had no effect"


def test_bm25_nb_classify(spark, trained):
    """BM25NB: scores normalize to 1; an unseen word's probability
    degenerates to the class-leaf score sc(c) (the MUST class term
    always matches — BM25NBClassifier.java:205-220)."""
    import math

    from lucene_solr_spark.functions.classification import bm25_nb_classify

    ex, classes, _model = trained
    inputs = ex.index.postings_slim.filter(F.col("doc_id") < 6).select(
        F.col("doc_id").alias("id"), "term", "tf"
    )
    rows = bm25_nb_classify(ex, classes, inputs).collect()
    sums: dict[int, float] = {}
    for r in rows:
        sums[r.id] = sums.get(r.id, 0.0) + r.score
    assert len(sums) == 6
    for v in sums.values():
        assert v == pytest.approx(1.0, rel=1e-6)
    # unseen word: score = prior + tf*ln(sc) for every class
    unseen = spark.createDataFrame(
        [(7777, "zzzunseenzzz", 2)], "id: long, term: string, tf: long"
    )
    raw = {
        r.cls: r.score
        for r in bm25_nb_classify(ex, classes, unseen, normalize=False).collect()
    }
    k1, b = float(ex.k1), float(ex.b)
    n = ex.index.doc_count
    df_c = {
        r.cls: r.cnt
        for r in classes.groupBy("cls").agg(F.count("*").alias("cnt")).collect()
    }
    inv1 = 1.0 / (k1 * ((1.0 - b) + (b * 1.0) / 1.0))
    for c, got in raw.items():
        w = math.log(1.0 + (n - df_c[c] + 0.5) / (df_c[c] + 0.5))
        sc = w - w / (1.0 + 1.0 * inv1)
        want = math.log(sc) + float(np.float32(2.0 * math.log(sc + 0.0)))
        assert got == pytest.approx(want, rel=1e-12), c


def test_knn_global_max_includes_unlabeled_top_hit(spark, trained):
    """Normalization divides by the OVERALL top-1 neighbor score even
    when that neighbor carries no class
    (KNearestNeighborClassifier.java:185)."""
    from lucene_solr_spark.functions.mlt import mlt_topk

    ex, classes, _model = trained
    top = mlt_topk(ex, 3, k=10, boost=True, min_term_freq=1, min_doc_freq=2).collect()
    best = top[0]
    classes2 = classes.withColumn(
        "cls",
        F.when(F.col("doc_id") != int(best.doc_id), F.col("cls")),
    )
    got = {
        r.cls: r.score
        for r in knn_classes(
            ex, classes2, 3, k=10, min_term_freq=1, min_doc_freq=2
        ).collect()
    }
    counts: dict[str, int] = {}
    boosts: dict[str, float] = {}
    for r in top[1:]:
        c = _cls_of(r.doc_id)
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + float(np.float32(r.score / best.score))
    sumdoc = sum(counts.values())
    want = {c: (boosts[c] / 10.0) * (10.0 / sumdoc) for c in counts}
    assert set(got) == set(want)
    for c in want:
        assert got[c] == pytest.approx(want[c], rel=1e-12)


def test_nb_avg_unique_uses_field_doc_count(spark, trained):
    """avgUniqueTermsPerDoc divides by the TEXT field's docCount, so an
    unlabeled doc still counts in the denominator
    (SimpleNaiveBayesClassifier.java:244-255)."""
    ex, classes, _model = trained
    # drop one doc's label: den must use ALL docs with text
    classes2 = classes.withColumn(
        "cls", F.when(F.col("doc_id") != 0, F.col("cls"))
    )
    model2 = naive_bayes_train(ex.index.postings_slim, classes2)
    stats = {r.cls: r.den for r in model2.class_stats.collect()}
    n_post = ex.index.postings_slim.count()
    n_field_docs = ex.index.postings_slim.select("doc_id").distinct().count()
    dwc = classes2.filter(F.col("cls").isNotNull()).count()
    df_c = {
        r.cls: r.n
        for r in classes2.filter(F.col("cls").isNotNull())
        .groupBy("cls")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for c, den in stats.items():
        want = (n_post / n_field_docs) * df_c[c] + dwc
        assert den == pytest.approx(want, rel=1e-12)


def test_nearest_fuzzy_topk_expansion_and_scoring(spark, trained):
    """NearestFuzzyQuery: variants share a 2-char prefix within edit
    distance 1; documents score through ARTIFICIAL df=1 term leaves
    (NearestFuzzyQuery.java:203-221) — a hand-built one-term case pins
    the whole chain."""
    import math

    from lucene_solr_spark.functions.classification import (
        knn_fuzzy_classes,
        nearest_fuzzy_topk,
    )
    from lucene_solr_spark.oracle import bm25, smallfloat
    from lucene_solr_spark.oracle.editdist import osa_distance

    ex, classes, _model = trained
    ix = ex.index
    top = nearest_fuzzy_topk(ex, 3, k=10).collect()
    assert len(top) == 10
    assert all(top[i].score >= top[i + 1].score for i in range(9))
    # hand-check doc 3's own score contribution structure: every source
    # term's exact variant exists (ed 0, boost 1), so the per-term weight
    # includes boost²·idf(df_exact) at least
    src = sorted(
        r.term
        for r in ix.postings_slim.filter(F.col("doc_id") == 3)
        .select("term").distinct().collect()
    )
    stats = {
        r.term: int(r.df)
        for r in ix.term_stats.filter(
            F.substring("term", 1, 2).isin(sorted({t[:2] for t in src}))
        ).collect()
    }
    n = ix.doc_count
    for t in src:
        assert t in stats  # the exact variant is always in its prefix set
        # and at least one variant is within ed 1 of itself
        assert osa_distance(t, t) == 0
    # the vote wraps the same top-k
    got = knn_fuzzy_classes(ex, classes, 3, k=10).collect()
    total = sum(r.score for r in got)
    # per-class Σ(score/max)/k: bounded by 1, equals 1 only if every
    # neighbor scored at the max
    assert 0.0 < total <= 1.0
    assert {r.cls for r in got} <= {"c0", "c1", "c2"}


def test_boolean_perceptron_hand_case(spark):
    """Hand-built two-doc case pinning the exact update rule: ttf-seeded
    weights, docID-order pass, modifier·tf clamp at 0, stale-FST batch
    refresh (BooleanPerceptronClassifier.java quirks)."""
    from lucene_solr_spark.functions.classification import (
        boolean_perceptron_classify,
        boolean_perceptron_train,
    )
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.createDataFrame(
        [(0, "aa aa bb"), (1, "bb cc cc cc")],
        "doc_id: long, text: string",
    )
    ix = build_index(docs, text_col="text", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="double")
    classes = spark.createDataFrame(
        [(0, "true"), (1, "false")], "doc_id: long, cls: string"
    )
    weights, bias = boolean_perceptron_train(ex, classes)
    # seed weights: aa=2 bb=2 cc=3; bias = 7/2 = 3.5
    assert bias == 3.5
    # doc0: output = 2*2 + 2 = 6 >= 3.5 -> assigned true == correct; no update
    # doc1: output = 2 + 3*3 = 11 >= 3.5 -> true, correct false -> modifier -1
    #   bb: max(0, 2 - 1*1) = 1 ; cc: max(0, 3 - 1*3) = 0
    assert weights == {"aa": 2, "bb": 1, "cc": 0}
    got = {
        r.id: (r.assigned, r.score)
        for r in boolean_perceptron_classify(
            weights,
            bias,
            ix.postings_slim.selectExpr("doc_id AS id", "term", "tf"),
        ).collect()
    }
    import math

    # doc0: 2*2+1 = 5 >= 3.5 true; doc1: 1 + 0 = 1 < 3.5 false
    assert got[0][0] is True and got[1][0] is False
    assert got[0][1] == pytest.approx(1 - math.exp(-abs(3.5 - 5) / 3.5))
    assert got[1][1] == pytest.approx(1 - math.exp(-abs(3.5 - 1) / 3.5))


def test_boolean_perceptron_batch_refresh_quirk(spark):
    """batch_size > 1: within a batch corrections re-derive from the
    STALE snapshot; the refreshed model differs from batch_size=1."""
    from lucene_solr_spark.functions.classification import (
        boolean_perceptron_train,
    )
    from lucene_solr_spark.operators.index_build import build_index
    from lucene_solr_spark.plans.df_executor import DFExecutor

    docs = spark.createDataFrame(
        [(0, "xx yy"), (1, "xx yy"), (2, "yy zz zz")],
        "doc_id: long, text: string",
    )
    ix = build_index(docs, text_col="text", doc_id_col="doc_id").persist()
    ex = DFExecutor(ix, mode="double")
    classes = spark.createDataFrame(
        [(0, "false"), (1, "false"), (2, "false")], "doc_id: long, cls: string"
    )
    w1, _ = boolean_perceptron_train(ex, classes, batch_size=1)
    w3, _ = boolean_perceptron_train(ex, classes, batch_size=3)
    assert w1 != w3  # the stale-snapshot semantics are real


def test_confusion_matrix_and_splitter(spark, trained):
    from lucene_solr_spark.functions.classification import (
        argmax_classes,
        confusion_matrix,
        dataset_splitter,
        naive_bayes_classify,
    )

    ex, classes, model = trained
    inputs = ex.index.postings_slim.filter(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("id"), "term", "tf"
    )
    pred = argmax_classes(naive_bayes_classify(model, inputs))
    truth = classes.select(F.col("doc_id").alias("id"), "cls").filter(
        F.col("id") < 30
    )
    cm = confusion_matrix(pred, truth).collect()
    assert sum(r.n for r in cm) == 30  # one prediction per doc
    # splitter partitions without overlap and is seed-deterministic
    docs = classes
    tr, te, cv = dataset_splitter(docs, test_ratio=0.2, cv_ratio=0.1, seed=7)
    n = docs.count()
    assert tr.count() + te.count() + cv.count() == n
    tr2, te2, cv2 = dataset_splitter(docs, test_ratio=0.2, cv_ratio=0.1, seed=7)
    assert sorted(r.doc_id for r in te.collect()) == sorted(
        r.doc_id for r in te2.collect()
    )
    with pytest.raises(ValueError):
        dataset_splitter(docs, test_ratio=0.7, cv_ratio=0.4)
