"""Suggest / spellcheck — the ``lucene/suggest`` module's two core roles.

- ``spell_suggest``: DirectSpellChecker (``suggest/src/java/.../spell/
  DirectSpellChecker.java:50-74``) — did-you-mean candidates drawn from
  the term dictionary within ``max_edits``, sharing a ``min_prefix``
  (default 1, the reference default), ranked by (distance, docFreq)
  exactly like SuggestWordQueue's score-then-frequency comparator
  (``spell/SuggestWordQueue.java:30``). Distance is OSA (adjacent
  transposition = ONE edit) — the reference's transposition-aware
  LuceneLevenshteinDistance (``spell/LuceneLevenshteinDistance.java``),
  consistent with this engine's FuzzyQuery semantics; computed as a
  codegen'd Levenshtein prefilter (OSA ≤ k ⇒ lev ≤ 2k) plus an
  Arrow-batched OSA refinement on the tiny borderline band.
- ``prefix_suggest``: completion over the dictionary weighted by
  docFreq — the HighFrequencyDictionary → AnalyzingSuggester path
  (``spell/HighFrequencyDictionary.java:33``,
  ``suggest/analyzing/AnalyzingSuggester.java:81``) reduced to its
  relational core: the FST is the reference's *physical* answer to
  prefix lookup; a term-sorted parquet dictionary with row-group
  pruning is the Spark-native one.

Both are single Catalyst plans over the (term-sorted, range-partitioned)
``term_stats`` table: the prefix predicate prunes row groups, the length
band and edit-distance filter run in whole-stage codegen, and the tiny
top-k result is the only thing collected — at a 10^9-term dictionary
this touches one prefix slice, never the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["spell_suggest", "prefix_suggest", "infix_suggest", "fuzzy_suggest"]


def _osa_dist_col(qterm: str):
    """Exact OSA distance to ``qterm`` of the ``term`` column as an
    Arrow-batched expression — callers prefilter with the codegen'd
    ``F.levenshtein`` band first so this only sees survivors."""

    @F.pandas_udf(T.IntegerType())
    def osa_d(terms: pd.Series) -> pd.Series:
        from lucene_solr_spark.oracle.editdist import osa_distance

        return terms.map(lambda t: osa_distance(t, qterm)).astype("int32")

    return osa_d(F.col("term"))


def spell_suggest(
    term_stats: DataFrame,
    word: str,
    *,
    max_edits: int = 2,
    k: int = 5,
    min_prefix: int = 1,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` dictionary corrections for ``word`` →
    (term, df, distance), ranked (distance asc, df desc, term asc).

    Candidate pruning mirrors the reference's automaton walk: shared
    ``min_prefix`` chars (DirectSpellChecker.minPrefix), a length band
    of ±``max_edits`` (a Levenshtein lower bound), exact term excluded
    (the reference only suggests *other* terms)."""
    if not word:
        raise ValueError("empty word")
    cand = term_stats.select("term", "df")
    if min_prefix > 0:
        cand = cand.filter(F.col("term").startswith(word[:min_prefix]))
    cand = (
        cand.filter(
            F.length("term").between(len(word) - max_edits, len(word) + max_edits)
        )
        .filter(F.col("term") != word)
        .filter(F.col("df") >= min_df)
        # OSA ≤ k forces lev ≤ 2k: the codegen'd levenshtein prunes the
        # dictionary slice before the exact Arrow-batched OSA ranks it
        .filter(F.levenshtein(F.col("term"), F.lit(word)) <= 2 * max_edits)
        .withColumn("distance", _osa_dist_col(word))
        .filter(F.col("distance") <= max_edits)
    )
    return (
        cand.select("term", "df", F.col("distance").cast("int").alias("distance"))
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def prefix_suggest(
    term_stats: DataFrame, prefix: str, *, k: int = 10
) -> DataFrame:
    """Top-``k`` completions of ``prefix`` by document frequency →
    (term, df), ranked (df desc, term asc)."""
    return (
        term_stats.filter(F.col("term").startswith(prefix))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def infix_suggest(
    term_stats: DataFrame, query: str, *, k: int = 10, min_df: int = 1
) -> DataFrame:
    """AnalyzingInfixSuggester role (``suggest/analyzing/
    AnalyzingInfixSuggester.java:100-139``) reduced to the term
    dictionary: suggestions CONTAINING ``query`` anywhere, prefix hits
    ranked first (the reference boosts exact-prefix matches), then
    weight (docFreq), then term → (term, df, is_prefix).

    Scale note: an infix predicate cannot prune the term-sorted
    dictionary's row groups (the reference builds a dedicated suggest
    index for exactly this reason); the 10^9-term path is an n-gram
    index over the dictionary — this full-scan form is the exact oracle
    for it, and the dictionary scan is still a single column-pruned
    pass."""
    if not query:
        raise ValueError("empty query")
    return (
        term_stats.select("term", "df")
        .filter(F.col("df") >= min_df)
        .filter(F.col("term").contains(query))
        .withColumn(
            "is_prefix", F.col("term").startswith(query).cast("int")
        )
        .orderBy(F.desc("is_prefix"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def fuzzy_suggest(
    term_stats: DataFrame,
    query: str,
    *,
    k: int = 10,
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
) -> DataFrame:
    """FuzzySuggester role (``suggest/analyzing/FuzzySuggester.java:47-90``):
    completions whose PREFIX is within ``max_edits`` of the typed query —
    typo-tolerant autocomplete. Reference defaults preserved: edits only
    after ``non_fuzzy_prefix`` (=1) leading chars, fuzziness only for
    queries of at least ``min_fuzzy_length`` (=3, shorter falls back to
    exact prefix), ranked by weight (docFreq) like AnalyzingSuggester,
    with (distance, term) as deterministic tiebreaks.

    Re-expression of the Levenshtein-automaton×FST intersection: the
    prefix distance is ``min over L in [len(q)-e, len(q)+e] of
    osa(term[:L], q)`` (OSA — the reference default
    ``FuzzySuggester.DEFAULT_TRANSPOSITIONS=true``,
    ``suggest/analyzing/FuzzySuggester.java:76``). The 2e+1 codegen'd
    levenshtein calls against the pruned dictionary slice (first-char +
    length-band predicates reach the term-sorted parquet scan) remain as
    the exactness-preserving prefilter (OSA ≤ e ⇒ lev ≤ 2e); the exact
    OSA min runs Arrow-batched on the survivors only."""
    if len(query) < min_fuzzy_length:
        return prefix_suggest(term_stats, query, k=k).withColumn(
            "distance", F.lit(0)
        )
    lens = [
        n for n in range(len(query) - max_edits, len(query) + max_edits + 1) if n > 0
    ]
    dists = [
        F.levenshtein(F.substring(F.col("term"), 1, n), F.lit(query)) for n in lens
    ]
    lev_min = F.least(*dists) if len(dists) > 1 else dists[0]

    @F.pandas_udf(T.IntegerType())
    def osa_prefix_min(terms: pd.Series) -> pd.Series:
        from lucene_solr_spark.oracle.editdist import osa_distance

        def d(t: str) -> int:
            # t[:n] clamps like F.substring for terms shorter than n
            return min(osa_distance(t[:n], query) for n in lens)

        return terms.map(d).astype("int32")

    cand = term_stats.select("term", "df").filter(
        F.length("term") >= len(query) - max_edits
    )
    if non_fuzzy_prefix > 0:
        cand = cand.filter(F.col("term").startswith(query[:non_fuzzy_prefix]))
    return (
        cand.filter(lev_min <= 2 * max_edits)
        .withColumn("distance", osa_prefix_min(F.col("term")).cast("int"))
        .filter(F.col("distance") <= max_edits)
        .orderBy(F.desc("df"), F.asc("distance"), F.asc("term"))
        .limit(k)
    )
