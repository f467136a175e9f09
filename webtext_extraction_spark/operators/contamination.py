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


def group_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    n: int = 4,
) -> DataFrame:
    """Cross-group n-gram overlap matrix — the split/source LEAKAGE
    diagnostic: after :func:`~...textstats.split_corpus` carves
    train/val/test, run this on the ``split`` column to measure how
    many word-n-grams the splits share (duplicate docs straddling a
    split boundary are invisible to per-split stats but surface here
    immediately); on ``source`` it maps cross-source duplication.

    ``overlap = shared / min(n_a, n_b)`` — containment-style, so a
    small eval split fully leaked into train reads 1.0 regardless of
    train's size.  Counts are exact integers over DISTINCT per-group
    gram-hash sets; one division, round 6.

    Shape (100 TB): per-doc distinct grams hash to int64 in the
    projection (text never shuffles), ONE distinct on (group, hash),
    then a self-equi-join on the hash — fan-out per gram is bounded
    by the GROUP count (distinct-per-group first), so a
    corpus-saturating gram emits at most C(groups, 2) pairs, and the
    pair groupBy aggregates map-side.  Group cardinality is
    driver-bounded by the diagnostic's purpose (splits / sources).

    Output: (group_a, group_b, shared_grams long, n_a long, n_b long,
    overlap double), group_a < group_b, only pairs sharing >= 1 gram.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # localCheckpoint: g feeds the totals AND both self-join sides —
    # unpinned, Spark re-runs the 100 TB gram explode three times
    # (the ccnet_buckets trade: eager narrow materialization buys
    # single-generation)
    g = (
        df.select(
            F.col(group_col).alias("_grp"),
            F.explode(gram_hash_array(F.col(text_col), n)).alias("_gh"),
        )
        .distinct()
        .localCheckpoint()
    )
    tot = g.groupBy("_grp").agg(F.count("*").cast("long").alias("_n"))
    a = g.select(F.col("_grp").alias("group_a"), "_gh")
    b = g.select(F.col("_grp").alias("group_b"), "_gh")
    shared = (
        a.join(b, "_gh")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count("*").cast("long").alias("shared_grams"))
    )
    ta = tot.select(F.col("_grp").alias("group_a"), F.col("_n").alias("n_a"))
    tb = tot.select(F.col("_grp").alias("group_b"), F.col("_n").alias("n_b"))
    return (
        shared.join(F.broadcast(ta), "group_a")
        .join(F.broadcast(tb), "group_b")
        .select(
            "group_a",
            "group_b",
            "shared_grams",
            "n_a",
            "n_b",
            F.round(
                F.col("shared_grams").cast("double")
                / F.least("n_a", "n_b").cast("double"),
                6,
            ).alias("overlap"),
        )
    )


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
