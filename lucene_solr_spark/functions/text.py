"""Text-analysis operators for training-data pipelines: quality features,
fingerprints, token counting, language ID. All JVM-side built-ins (no
Python in the hot path) except the explicitly-noted heuristics."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "quality_features",
    "doc_fingerprint",
    "token_counts",
    "language_id",
    "STOPWORDS_SMALL",
]

_TOKEN_RX = "[a-z0-9]+"

#: compact stop set used by the quality heuristic (deliberately small and
#: mirrored literally in the SQL oracle)
STOPWORDS_SMALL = ("a", "an", "and", "the", "to", "of", "in", "is")

#: per-language stopword profiles for the n-gram/stopword language-ID
#: heuristic (tiny; a real pipeline would plug fasttext at this seam)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "ein"},
}


def _tok(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RX), 0)
        ).alias("term"),
    )


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, n_stop, stop_ratio, mean_token_len) — the
    classic quality-scoring signals; integer sums + one double division
    (deterministic across engines)."""
    tok = _tok(df, text_col, id_col)
    is_stop = F.col("term").isin(*STOPWORDS_SMALL).cast("long")
    return tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(is_stop).alias("n_stop"),
        (F.sum(is_stop).cast("double") / F.count("*")).alias("stop_ratio"),
        (F.sum(F.length("term")).cast("double") / F.count("*")).alias("mean_token_len"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic document fingerprint: min/max md5 over the distinct
    token set + unique count (a 1-hash MinHash; engine-portable since md5
    is standardized)."""
    tok = _tok(df, text_col, id_col).distinct()
    return tok.groupBy("doc_id").agg(
        F.min(F.md5("term")).alias("fp_min"),
        F.max(F.md5("term")).alias("fp_max"),
        F.count("*").alias("n_unique"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (4 chars/token rule
    with word-boundary rounding — the common heuristic for budget
    planning)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    subwords = F.aggregate(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        subwords.alias("bpe_est_tokens"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-profile language ID: argmax over per-language stopword hit
    ratios; 'und' when nothing matches. Pure relational (explode + pivot-
    style conditional sums), so it scales as one groupBy."""
    tok = _tok(df, text_col, id_col)
    aggs = [
        F.sum(F.col("term").isin(*sorted(prof)).cast("long")).alias(f"hits_{lang}")
        for lang, prof in sorted(_LANG_PROFILES.items())
    ]
    scored = tok.groupBy("doc_id").agg(F.count("*").alias("n"), *aggs)
    pairs = F.array(
        *[
            F.struct(
                F.col(f"hits_{lang}").alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in sorted(_LANG_PROFILES)
        ]
    )
    best = F.array_max(pairs)
    return scored.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        (best["hits"].cast("double") / F.col("n")).alias("lang_confidence"),
    )
