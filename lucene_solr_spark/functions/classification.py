"""Index-backed text classification (the reference's lucene/classification
module) re-expressed as distributed DataFrame plans.

- ``SimpleNaiveBayesClassifier.java`` — add-1-smoothed multinomial Naive
  Bayes where every statistic is an index lookup: P(c) from the class
  df, P(w|c) from the count of class-c docs containing w (:216-243
  getWordFreqForClass is a DOC count, not a term-frequency), the
  denominator ``avgUniqueTermsPerDoc·df(c) + docsWithClass``
  (:244-255 getTextTermFreqForClass), and a log-sum-exp normalization
  to 0-1 (:298-325 normClassificationResults).
- ``KNearestNeighborClassifier.java`` — a MoreLikeThis top-k search over
  the index, then a rank-weighted class vote: per class,
  ``count·(Σ score/maxScore)/count / k`` with the ``k/sumdoc``
  correction when fewer than k hits carry a class (:178-232
  buildListFromTopDocs).

Spark-first shape: training *is* the existing inverted index — the NB
model is two aggregation frames over ``postings ⋈ classes`` (one
shuffle), and classification of a document batch is a broadcast-joined
map-side plan (tokens ⋈ class-term table → one groupBy per (doc,
class)).  Nothing about the reference's per-query search loop survives:
where the Java runs one Boolean count query per (input token × class),
the whole token×class grid here is a single join.

Determinism note: per-token log-likelihood contributions and the
normalization's exp terms are rounded to float32 before the double
accumulation. Float32 addends with bounded magnitude ratio (< 2^29)
sum EXACTLY in a double accumulator, so the distributed sum is
order-independent and hash-identical to the SQL oracle — the same
float-leaf/double-accumulate contract the engine's disjunction scorer
uses (functions/mlt.py mlt_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "NaiveBayesModel",
    "naive_bayes_train",
    "naive_bayes_classify",
    "knn_classes",
    "bm25_nb_classify",
]


class NaiveBayesModel:
    """Trained NB statistics, all as (small) DataFrames ready to
    broadcast into the classify join."""

    def __init__(
        self,
        class_stats: DataFrame,  # (cls, df_c, prior, den)
        class_term: DataFrame,  # (cls, term, wdf)
        docs_with_class: int,
    ) -> None:
        self.class_stats = class_stats
        self.class_term = class_term
        self.docs_with_class = docs_with_class


def naive_bayes_train(
    postings: DataFrame,  # (doc_id, term, ...) — the index postings
    classes: DataFrame,  # (doc_id, cls)
) -> NaiveBayesModel:
    """One aggregation pass over ``postings ⋈ classes``.

    - ``docsWithClass`` = #docs carrying a class value
      (SimpleNaiveBayesClassifier.java:168-186 countDocsWithClass)
    - prior(c) = ln df(c) − ln docsWithClass (:285-287)
    - den(c) = (sumDocFreq/docCount)·df(c) + docsWithClass (:244-255 —
      the reference's add-|V| smoothing uses docsWithClass as |V|)
    - wdf(c, w) = #docs of class c containing w (:266-283)
    """
    classes = classes.select("doc_id", "cls").filter(F.col("cls").isNotNull())
    docs_with_class = classes.select("doc_id").distinct().count()
    if docs_with_class == 0:
        raise ValueError("no classified documents to train on")

    tagged = postings.select("doc_id", "term").join(
        F.broadcast(classes), "doc_id"
    )
    class_term = (
        tagged.groupBy("cls", "term")
        .agg(F.count(F.lit(1)).alias("wdf"))  # postings are distinct per doc
    )
    # avg # of unique terms per doc = sumDocFreq / docCount of the TEXT
    # field itself (SimpleNaiveBayesClassifier.java:244-255 reads both
    # from MultiTerms over the whole reader — unlabeled docs count here,
    # only the +docsWithClass smoothing uses the labeled count)
    n_postings = postings.count()
    field_doc_count = postings.select("doc_id").distinct().count()
    avg_unique = n_postings / field_doc_count
    class_stats = (
        classes.groupBy("cls")
        .agg(F.countDistinct("doc_id").alias("df_c"))
        .withColumn(
            "prior",
            F.log(F.col("df_c").cast("double"))
            - F.lit(float(__import__("math").log(docs_with_class))),
        )
        .withColumn(
            "den",
            F.lit(float(avg_unique)) * F.col("df_c").cast("double")
            + F.lit(float(docs_with_class)),
        )
    )
    return NaiveBayesModel(class_stats, class_term, docs_with_class)


def naive_bayes_classify(
    model: NaiveBayesModel,
    tokens: DataFrame,  # (id, term, tf) — analyzed input texts
    *,
    normalize: bool = True,
) -> DataFrame:
    """(id, cls, score) for EVERY class per input — assignClass is the
    per-id argmax; ``normalize`` applies the 0-1 log-sum-exp transform
    (SimpleNaiveBayesClassifier.java:298-325).

    Each input token (with multiplicity tf) contributes
    ``ln((wdf+1)/den)`` — absent (class, word) pairs contribute the
    smoothed ``ln(1/den)`` — so the plan is: token frame × classes
    (broadcast), LEFT join the class-term table, one groupBy.
    """
    stats = F.broadcast(model.class_stats)
    grid = tokens.select("id", "term", "tf").crossJoin(
        stats.select("cls", "den")
    )
    joined = grid.join(
        F.broadcast(model.class_term), ["cls", "term"], "left"
    ).withColumn("wdf", F.coalesce(F.col("wdf"), F.lit(0)))
    # per-(input, class) log likelihood; float32 leaves, double sum
    contrib = joined.withColumn(
        "c",
        (
            F.col("tf").cast("double")
            * F.log((F.col("wdf").cast("double") + 1.0) / F.col("den"))
        )
        .cast("float")
        .cast("double"),
    )
    scored = (
        contrib.groupBy("id", "cls")
        .agg(F.sum("c").alias("ll"))
        .join(stats.select("cls", "prior"), "cls")
        .withColumn("score", F.col("prior") + F.col("ll"))
        .select("id", "cls", "score")
    )
    if not normalize:
        return scored
    w = Window.partitionBy("id")
    smax = F.max("score").over(w)
    sumexp = F.sum(
        F.exp(F.col("score") - smax).cast("float").cast("double")
    ).over(w)
    # final normalized score rounds to float32: JVM Math.exp/log are only
    # 1-ulp-accurate, so the f32 round absorbs library differences and
    # keeps the result engine-independent (ClassificationResult carries a
    # double in Java; the low 29 bits here are library noise, not signal)
    return scored.withColumn(
        "score",
        F.exp(F.col("score") - (smax + F.log(sumexp)))
        .cast("float")
        .cast("double"),
    )


def knn_classes(
    executor,
    classes: DataFrame,  # (doc_id, cls)
    doc_id: int,
    *,
    k: int = 10,
    boost: bool = True,
    **mlt_kwargs,
) -> DataFrame:
    """KNearestNeighborClassifier: MoreLikeThis(k) neighbors of ``doc_id``
    → rank-weighted vote (KNearestNeighborClassifier.java:153-176
    knnSearch with mlt boost on, :178-232 buildListFromTopDocs).

    Returns (cls, score) — per class ``(Σ score_i/maxScore)/k``, scaled
    by ``k/sumdoc`` when fewer than k neighbors carry a class.
    """
    from .mlt import mlt_topk

    # the single-scan MLT kernel (float32 leaves, exact double sum) keeps
    # the 25-term disjunction's distributed aggregation order-independent
    top = mlt_topk(executor, doc_id, k=k, boost=boost, **mlt_kwargs).select(
        "doc_id", "score"
    )
    # normalize by the GLOBAL top-1 neighbor score — computed over the
    # full top-k BEFORE the class join (topDocs.scoreDocs[0].score,
    # KNearestNeighborClassifier.java:185): an unlabeled best neighbor
    # still sets the scale, it just casts no vote
    top = top.withColumn(
        "_mx", F.max("score").over(Window.partitionBy(F.lit(1)))
    )
    hits = top.join(
        classes.filter(F.col("cls").isNotNull()), "doc_id", "inner"
    )
    # f32-rounded addends → order-independent double sum (see module doc)
    voted = hits.withColumn(
        "nb", (F.col("score") / F.col("_mx")).cast("float").cast("double")
    )
    agg = voted.groupBy("cls").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("nb").alias("boost_sum")
    )
    sumdoc = F.sum("cnt").over(Window.partitionBy(F.lit(1)))
    # (cnt · (boost_sum/cnt)) / k, then · k/sumdoc when sumdoc < k
    return agg.withColumn(
        "score",
        F.when(
            sumdoc < F.lit(int(k)),
            (F.col("boost_sum") / F.lit(float(k)))
            * (F.lit(float(k)) / sumdoc.cast("double")),
        ).otherwise(F.col("boost_sum") / F.lit(float(k))),
    ).select("cls", "score")


def bm25_nb_classify(
    executor,
    classes: DataFrame,  # (doc_id, cls)
    tokens: DataFrame,  # (id, term, tf)
    *,
    normalize: bool = True,
) -> DataFrame:
    """BM25NBClassifier (``BM25NBClassifier.java:198-231``): the
    "probability" of word w given class c is the TOP-1 BM25 score of
    ``MUST(class:c) SHOULD(text:w)`` over a two-field index whose class
    field holds one token per doc.

    Re-expression: a length-1 field gives every doc the same class-leaf
    score, so top-1 = sc(c) + max over class-c docs of the text leaf
    score of w — the whole (class × word) grid is ONE groupBy-max over
    ``postings ⋈ classes`` instead of a search per pair.  Priors are
    ``ln sc(c)`` (:222-231), likelihood ``Σ tf·ln(sc + max)`` with the
    absent-word probability degenerating to sc (the class term always
    matches), normalization as in SimpleNaiveBayes.
    """
    import math

    from ..oracle import bm25 as _bm25

    ix = executor.index
    k1, b = float(executor.k1), float(executor.b)
    n_docs = ix.doc_count
    cls_rows = (
        classes.filter(F.col("cls").isNotNull())
        .groupBy("cls")
        .agg(F.countDistinct("doc_id").alias("df_c"))
        .collect()
    )
    # class-field leaf: df = df_c, tf = 1, dl = declen = avgdl = 1
    inv1 = 1.0 / (k1 * ((1.0 - b) + (b * 1.0) / 1.0))
    sc = {}
    for r in cls_rows:
        w = math.log(1.0 + (n_docs - r.df_c + 0.5) / (r.df_c + 0.5))
        sc[r.cls] = (r.cls, w - w / (1.0 + 1.0 * inv1), math.log(w - w / (1.0 + 1.0 * inv1)))
    spark = tokens.sparkSession
    sc_df = F.broadcast(
        spark.createDataFrame(
            list(sc.values()), "cls: string, sc: double, prior: double"
        )
    )
    # text-field leaf score per (term, doc) — the engine's double chain
    # (bm25_score_sql twin, same shape as mlt_topk's single-scan leaf)
    lut = F.lit(_bm25.LENGTH_TABLE_F32.astype(float).tolist())
    declen = F.element_at(lut, F.col("norm").cast("int") + 1)
    inv = F.lit(1.0) / (
        F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * declen / F.lit(executor._avgdl_double))
    )
    w_col = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    leaf = (w_col - w_col / (F.lit(1.0) + F.col("tf").cast("double") * inv)).alias("s")
    text_scores = (
        ix.postings_slim.join(ix.term_stats.select("term", "df"), "term")
        .join(executor._norms(), "doc_id")
        .select("term", "doc_id", leaf)
    )
    per_class_max = (
        text_scores.join(
            F.broadcast(classes.filter(F.col("cls").isNotNull())), "doc_id"
        )
        .groupBy("cls", "term")
        .agg(F.max("s").alias("mx"))
    )
    grid = tokens.select("id", "term", "tf").crossJoin(
        sc_df.select("cls", "sc")
    )
    contrib = (
        grid.join(per_class_max, ["cls", "term"], "left")
        .withColumn(
            "c",
            (
                F.col("tf").cast("double")
                * F.log(F.col("sc") + F.coalesce(F.col("mx"), F.lit(0.0)))
            )
            .cast("float")
            .cast("double"),
        )
    )
    scored = (
        contrib.groupBy("id", "cls")
        .agg(F.sum("c").alias("ll"))
        .join(sc_df.select("cls", "prior"), "cls")
        .withColumn("score", F.col("prior") + F.col("ll"))
        .select("id", "cls", "score")
    )
    if not normalize:
        return scored
    w = Window.partitionBy("id")
    smax = F.max("score").over(w)
    sumexp = F.sum(
        F.exp(F.col("score") - smax).cast("float").cast("double")
    ).over(w)
    return scored.withColumn(
        "score",
        F.exp(F.col("score") - (smax + F.log(sumexp)))
        .cast("float")
        .cast("double"),
    )


def nearest_fuzzy_topk(
    executor,
    doc_id: int,
    *,
    k: int = 10,
    max_edits: int = 1,
    prefix_length: int = 2,
    max_variants_per_term: int = 50,
) -> DataFrame:
    """NearestFuzzyQuery (``classification/utils/NearestFuzzyQuery.java``)
    — the fuzzy analog of MoreLikeThis: every distinct source-doc term
    fuzzy-expands (edit distance ≤ 1, 2-char shared prefix, :53-55),
    each variant scored ``boost² · idf`` where boost is the fuzzy
    ``1 − ed/min(len)`` and idf uses the SOURCE term's df (or the
    integer-average variant df when the source is unindexed,
    :172-178); variants then score documents as TermQueries with an
    ARTIFICIAL df of 1 (:203-221 newTermQuery builds df=ttf=1 term
    states), boosted by their variant score, summed as nested SHOULDs.

    Single pruned dictionary probe (prefix in-list) + one postings scan;
    float32 leaves, exact double sum (the engine contract)."""
    import math

    from ..oracle import bm25 as _bm25
    from ..oracle.editdist import osa_distance

    ix = executor.index
    n_docs = ix.doc_count
    src_terms = sorted(
        r.term
        for r in ix.postings_slim.filter(F.col("doc_id") == int(doc_id))
        .select("term")
        .distinct()
        .collect()
    )
    spark = ix.postings.sparkSession
    if not src_terms:
        return spark.createDataFrame([], "doc_id long, score double")
    prefixes = sorted({t[:prefix_length] for t in src_terms})
    cand = (
        ix.term_stats.filter(
            F.substring("term", 1, prefix_length).isin(prefixes)
        )
        .select("term", "df")
        .collect()
    )
    by_prefix: dict[str, list] = {}
    for r in cand:
        by_prefix.setdefault(r.term[:prefix_length], []).append(
            (r.term, int(r.df))
        )
    # per source term: variants, boost, df policy, variant score
    weights: dict[str, float] = {}
    for src in src_terms:
        variants = []
        exact_df = 0
        total_df = 0
        for term, df in by_prefix.get(src[:prefix_length], ()):
            ed = osa_distance(src, term)
            if ed > max_edits:
                continue
            boost = 1.0 - ed / min(len(src), len(term))
            variants.append((term, boost))
            total_df += df
            if term == src:
                exact_df = df
        if not variants:
            continue
        variants.sort(key=lambda x: (-x[1], x[0]))
        variants = variants[:max_variants_per_term]
        df = exact_df if exact_df > 0 else total_df // len(variants)
        idf = math.log((n_docs + 1) / (df + 1.0)) + 1.0
        for term, boost in variants:
            # a term can be a variant of several source terms: the
            # nested SHOULD groups sum, so weights accumulate
            weights[term] = weights.get(term, 0.0) + boost * boost * idf
    if not weights:
        return spark.createDataFrame([], "doc_id long, score double")
    # document scoring: TermQuery with ARTIFICIAL df = 1
    w_df1 = math.log(1.0 + (n_docs - 1 + 0.5) / (1 + 0.5))
    wmap = F.create_map(
        *[
            x
            for t, s in sorted(weights.items())
            for x in (F.lit(t), F.lit(s * w_df1))
        ]
    )
    rows = ix.postings_slim.filter(
        F.col("term").isin(list(weights))
    ).join(executor._norms(), "doc_id")
    lut = F.lit(_bm25.LENGTH_TABLE_F32.astype(float).tolist())
    declen = F.element_at(lut, F.col("norm").cast("int") + 1)
    inv = F.lit(1.0) / (
        F.lit(float(executor.k1))
        * (
            F.lit(1.0 - executor.b)
            + F.lit(float(executor.b)) * declen / F.lit(executor._avgdl_double)
        )
    )
    w = wmap[F.col("term")]
    leaf = (
        w - w / (F.lit(1.0) + F.col("tf").cast("double") * inv)
    ).cast("float").cast("double")
    return (
        rows.select("doc_id", leaf.alias("s"))
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )


def knn_fuzzy_classes(
    executor,
    classes: DataFrame,
    doc_id: int,
    *,
    k: int = 10,
    **nf_kwargs,
) -> DataFrame:
    """KNearestFuzzyClassifier (``KNearestFuzzyClassifier.java``): the
    NearestFuzzyQuery top-k neighbors voted exactly like
    KNearestNeighborClassifier (shared buildListFromTopDocs math)."""
    top = nearest_fuzzy_topk(executor, doc_id, k=k, **nf_kwargs)
    top = top.withColumn(
        "_mx", F.max("score").over(Window.partitionBy(F.lit(1)))
    )
    hits = top.join(
        classes.filter(F.col("cls").isNotNull()), "doc_id", "inner"
    )
    voted = hits.withColumn(
        "nb", (F.col("score") / F.col("_mx")).cast("float").cast("double")
    )
    agg = voted.groupBy("cls").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("nb").alias("boost_sum")
    )
    sumdoc = F.sum("cnt").over(Window.partitionBy(F.lit(1)))
    return agg.withColumn(
        "score",
        F.when(
            sumdoc < F.lit(int(k)),
            (F.col("boost_sum") / F.lit(float(k)))
            * (F.lit(float(k)) / sumdoc.cast("double")),
        ).otherwise(F.col("boost_sum") / F.lit(float(k))),
    ).select("cls", "score")


def boolean_perceptron_train(
    executor,
    classes: DataFrame,  # (doc_id, cls) with cls in {"true", anything}
    *,
    batch_size: int = 1,
    bias: float | None = None,
) -> tuple[dict[str, int], float]:
    """BooleanPerceptronClassifier training
    (``BooleanPerceptronClassifier.java:74-160, 200-236``): weights
    start at each term's total term frequency (LONGS — the FST output
    type), bias defaults to sumTotalTermFreq/docCount; docs stream in
    docID order, each predicted with the CURRENT FST (refreshed only
    every ``batch_size`` docs — within a batch, corrections re-derive
    from the stale FST value, the reference's exact quirk), and a
    misprediction shifts every doc term by ``modifier · tf`` clamped at
    0.  Sequential by construction (the reference walks one stored-field
    search); the training pass runs driver-side over the collected
    per-doc postings — the model is a term table, the input one pass of
    (doc, term, tf) rows.  Returns (weights, bias)."""
    ix = executor.index
    if bias is None or bias == 0.0:
        bias = ix.sum_ttf / ix.doc_count
    weights: dict[str, int] = {
        r.term: int(r.ttf) for r in ix.term_stats.select("term", "ttf").collect()
    }
    fst: dict[str, int] = dict(weights)  # the compiled snapshot
    labels = {
        r.doc_id: (str(r.cls).lower() == "true")
        for r in classes.filter(F.col("cls").isNotNull()).collect()
    }
    rows = (
        ix.postings_slim.select("doc_id", "term", "tf")
        .filter(F.col("doc_id").isin([int(d) for d in labels]))
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r.doc_id), []).append((r.term, int(r.tf)))
    batch_count = 0
    for doc_id in sorted(by_doc):
        toks = by_doc[doc_id]
        output = sum(fst.get(t, 0) * tf for t, tf in toks)
        assigned = output >= bias
        correct = labels[doc_id]
        modifier = (1 if correct else 0) - (1 if assigned else 0)
        if modifier != 0:
            for t, tf in sorted(toks):
                prev = fst.get(t)
                weights[t] = 0 if prev is None else max(0, prev + modifier * tf)
            if batch_count % int(batch_size) == 0:
                fst = dict(weights)
        batch_count += 1
    return dict(fst), float(bias)


def boolean_perceptron_classify(
    weights: dict[str, int],
    bias: float,
    tokens: DataFrame,  # (id, term, tf)
) -> DataFrame:
    """(id, assigned, score): output = Σ weight(token)·tf, assigned =
    output ≥ bias, score = 1 − e^(−|bias − output|/bias)
    (BooleanPerceptronClassifier.java:218-235) — one broadcast join."""
    spark = tokens.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(t, int(w)) for t, w in sorted(weights.items())],
            "term: string, w: long",
        )
    )
    out = (
        tokens.join(wdf, "term", "left")
        .groupBy("id")
        .agg(
            F.sum(
                F.coalesce(F.col("w"), F.lit(0)) * F.col("tf")
            ).alias("output")
        )
    )
    score = F.lit(1.0) - F.exp(
        -F.abs(F.lit(float(bias)) - F.col("output").cast("double"))
        / F.lit(float(bias))
    )
    return out.select(
        "id",
        (F.col("output").cast("double") >= F.lit(float(bias))).alias(
            "assigned"
        ),
        score.alias("score"),
    )


def argmax_classes(scored: DataFrame) -> DataFrame:
    """(id, cls) — assignClass over a (id, cls, score) frame: the
    max-score class per input, ties to the lexicographically smallest
    class (the reference's HashMap iteration leaves ties unspecified;
    a total order is pinned for determinism)."""
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("cls"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "cls")
    )


def confusion_matrix(
    predicted: DataFrame,  # (id, cls) — classifier assignments
    truth: DataFrame,  # (id, cls) — gold labels
) -> DataFrame:
    """ConfusionMatrixGenerator (``classification/utils/
    ConfusionMatrixGenerator.java``): the (actual, predicted, count)
    grid — one join + groupBy; accuracy/precision/recall derive from it
    relationally (the reference walks documents one classify() at a
    time; here the whole evaluation is a single plan)."""
    return (
        truth.select("id", F.col("cls").alias("actual"))
        .join(predicted.select("id", F.col("cls").alias("predicted")), "id")
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dataset_splitter(
    docs: DataFrame,
    *,
    test_ratio: float,
    cv_ratio: float = 0.0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """DatasetSplitter (``classification/utils/DatasetSplitter.java``):
    (train, test, cross-validation) split.  The reference hashes docs
    into three sub-indexes by ratio; here a seeded randomSplit —
    deterministic for a fixed seed and input partitioning."""
    if test_ratio + cv_ratio >= 1.0:
        raise ValueError("test + cv ratios must leave room for training")
    train, test, cv = docs.randomSplit(
        [1.0 - test_ratio - cv_ratio, test_ratio, cv_ratio], seed=seed
    )
    return train, test, cv
