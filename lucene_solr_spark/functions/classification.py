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
    # avg # of unique terms per doc = sumDocFreq / docCount, over the
    # TRAINING docs (the reader the reference sees)
    n_postings = postings.count()
    avg_unique = n_postings / docs_with_class
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
    hits = top.join(
        classes.filter(F.col("cls").isNotNull()), "doc_id", "inner"
    )
    max_score = F.max("score").over(Window.partitionBy(F.lit(1)))
    # f32-rounded addends → order-independent double sum (see module doc)
    voted = hits.withColumn(
        "nb", (F.col("score") / max_score).cast("float").cast("double")
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
