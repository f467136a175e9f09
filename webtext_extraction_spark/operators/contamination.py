"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation set.

This is the standard eval-leak scrub of an LLM training-data pipeline
(GPT-3 appendix C's 13-gram overlap filter; Llama / FineWeb run the
same shape).  The reference repo has no analogue — this is one of the
engine-added corpus operators, alongside dedup/ and textstats.

Shape (the 100 TB story): the benchmark side is small (eval suites are
~10^5-10^6 grams), so its distinct gram-hash set is BROADCAST; the
document side streams through one explode + broadcast hash join +
groupBy(doc_id) with map-side partial aggregation.  The 100 TB text
column is read once, nothing document-sized ever shuffles — the only
shuffle carries (doc_id, two ints).  Grams are hashed to 64-bit
(functions.text.portable_hash64, md5-based) before the join so key
width is constant regardless of n; the md5 basis keeps the hash
bit-identical in Spark / DuckDB / Python for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from webtext_extraction_spark.functions.text import (
    ngrams_of_words,
    portable_hash64,
    words,
)


def gram_hash_array(col, n: int) -> Column:
    """Distinct 64-bit hashes of the sliding word-n-grams of ``col``
    (empty when the doc has fewer than n words)."""
    return F.array_distinct(F.transform(ngrams_of_words(words(col), n), portable_hash64))


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination stats against a benchmark corpus.

    Returns one row per input document (docs with < n words included,
    with n_grams = 0):

    - n_grams             distinct word-n-grams in the document
    - hit_grams           of those, how many occur anywhere in bench
    - contamination_frac  hit_grams / n_grams (0.0 when n_grams = 0)
    - contaminated        hit_grams > 0 — the GPT-3-style "any overlap
                          disqualifies" flag; callers wanting a softer
                          policy threshold contamination_frac instead
    """
    bench_g = bench.select(
        F.explode(gram_hash_array(F.col(bench_text_col), n)).alias("gh")
    ).distinct()
    doc_g = df.select(
        F.col(id_col).alias("_id"),
        F.explode(gram_hash_array(F.col(text_col), n)).alias("gh"),
    )
    hits = (
        doc_g.join(F.broadcast(bench_g.withColumn("_hit", F.lit(1))), "gh", "left")
        .groupBy("_id")
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("int").alias("hit_grams"),
        )
    )
    ng = F.coalesce(F.col("n_grams"), F.lit(0))
    hg = F.coalesce(F.col("hit_grams"), F.lit(0))
    return (
        df.select(F.col(id_col))
        .join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            ng.cast("int").alias("n_grams"),
            hg.cast("int").alias("hit_grams"),
            F.round(
                F.when(ng > 0, hg.cast("double") / ng).otherwise(F.lit(0.0)), 6
            )
            .cast("double")
            .alias("contamination_frac"),
            (hg > 0).alias("contaminated"),
        )
    )
