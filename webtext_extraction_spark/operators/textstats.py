"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All four are pure column-expression operators (whole-stage codegen,
zero Python) with exact DuckDB oracles.  The heuristics are the
standard cheap pre-filters of a training-data pipeline — not models:

- lang_id: charset-share heuristic (JP ranges vs ASCII) + stopword hit
  rate for en; 'unknown' when neither dominates.
- quality_score: bounded combination of length, alpha ratio,
  punctuation ratio, stopword ratio, mean word length.
- token counts: whitespace tokens and a BPE-ish regex token count
  (word pieces / numbers / punctuation runs).
- fingerprint: order-sensitive modular polynomial hash over word
  hashes — a rolling-hash document signature that is identical in
  Spark, DuckDB, and Python (used for fast order-sensitive dedup,
  complementing the order-insensitive minhash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from webtext_extraction_spark.functions.text import portable_hash64, words

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]
FP_MOD = 1_000_000_007
FP_TOKEN_MOD = 1_000_003
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _char_count(col, pattern: str) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, pattern, ""))


def lang_id_expr(col) -> Column:
    jp = _char_count(col, r"[ぁ-んァ-ヶ一-龯ー]")
    total = F.greatest(F.length(col), F.lit(1))
    ws = words(col)
    stop_hits = F.size(F.filter(ws, lambda w: F.lower(w).isin(EN_STOPWORDS)))
    n_words = F.greatest(F.size(ws), F.lit(1))
    alpha_ratio = _char_count(col, r"[A-Za-z ]") / total
    return (
        F.when(jp / total > 0.2, F.lit("ja"))
        .when((alpha_ratio > 0.7) | (stop_hits / n_words > 0.05), F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def quality_score_expr(col) -> Column:
    """0..1 quality heuristic: rewards mid-length docs with normal
    punctuation/stopword profiles; penalizes fragments and symbol soup."""
    n = F.length(col).cast("double")
    ws = words(col)
    n_words = F.greatest(F.size(ws), F.lit(1)).cast("double")
    punct_ratio = _char_count(col, r"[^\w\s]") / F.greatest(n, F.lit(1.0))
    stop_ratio = (
        F.size(F.filter(ws, lambda w: F.lower(w).isin(EN_STOPWORDS))).cast("double") / n_words
    )
    mean_word_len = F.greatest(n, F.lit(1.0)) / n_words
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_score = F.when(punct_ratio < 0.2, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (punct_ratio - 0.2) * 2.0)
    )
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    wordlen_score = F.when((mean_word_len >= 3.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.5)
    return F.round(
        0.4 * len_score + 0.2 * punct_score + 0.2 * stop_score + 0.2 * wordlen_score, 6
    )


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("ws_tokens", F.size(words(F.col(text_col)))).withColumn(
        "bpe_tokens", F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
    )


def fingerprint_expr(col) -> Column:
    """Order-sensitive rolling hash: acc = (acc*31 + h(w) mod 1e6+3)
    mod 1e9+7 — stays < 2^35 at every step, so no overflow divergence
    between engines."""
    return F.aggregate(
        words(col),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + portable_hash64(w) % FP_TOKEN_MOD) % FP_MOD,
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document profile: the operator queries() exposes."""
    out = token_counts(df, text_col)
    return out.select(
        F.col(id_col),
        lang_id_expr(F.col(text_col)).alias("lang_pred"),
        quality_score_expr(F.col(text_col)).alias("quality"),
        "ws_tokens",
        "bpe_tokens",
        fingerprint_expr(F.col(text_col)).alias("fingerprint"),
    )
