"""Deterministic synthetic transcripts table (FIXTURES.md §1).

The input per BASELINE.json:input_hint is an Iceberg table
(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp).  This module synthesizes that table at
any scale, seeded and wall-clock-free, distributing the generation
itself: the driver emits only (conv_id, turn_idx) skeleton ranges and
a pandas UDF materializes payloads executor-side from the archetype
pool, so a 10^12-turn table would generate without a driver bottleneck.

Payload pool: the golden fixture archetypes (tests/fixtures via
fixtures_pages), with deterministic filler drawn from a word list so
dedup/skew paths stay exercised.  ~5% of conversations share hot
domains carrying outsized payloads (FIXTURES.md T04) to exercise the
salting path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from webtext_extraction_spark.fixtures_pages import bench_payload_for, payload_for

PAYLOAD_TYPE = StructType(
    [
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("role", StringType()),
    ]
)

_ROLES = ["user", "assistant", "tool"]


def _payload_batch(conv_ids: pd.Series, turn_idxs: pd.Series, fn) -> pd.DataFrame:
    texts, tools, roles = [], [], []
    for conv_id, turn_idx in zip(conv_ids, turn_idxs):
        text, tool = fn(str(conv_id), int(turn_idx))
        texts.append(text)
        tools.append(tool)
        roles.append(_ROLES[int(turn_idx) % 3])
    return pd.DataFrame({"text": texts, "tool": tools, "role": roles})


@pandas_udf(PAYLOAD_TYPE)
def payload_udf(conv_ids: pd.Series, turn_idxs: pd.Series) -> pd.DataFrame:
    return _payload_batch(conv_ids, turn_idxs, payload_for)


@pandas_udf(PAYLOAD_TYPE)
def bench_payload_udf(conv_ids: pd.Series, turn_idxs: pd.Series) -> pd.DataFrame:
    return _payload_batch(conv_ids, turn_idxs, bench_payload_for)


def synth_transcripts(
    spark: SparkSession,
    num_conversations: int = 200,
    partitions: int | None = None,
    profile: str = "golden",
) -> DataFrame:
    """Build the transcripts DataFrame, fully distributed.

    conv_id = f"conv{i:06d}"; turns per conversation = 1 + (i % 12)
    (contiguous turn_idx); ts = epoch + row_index seconds (monotone,
    deterministic).  Payload archetype is a seeded hash of
    (conv_id, turn_idx) — see fixtures_pages.payload_for.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    skeleton = (
        spark.range(num_conversations, numPartitions=partitions)
        .select(
            F.format_string("conv%06d", F.col("id")).alias("conv_id"),
            (F.col("id") % 12 + 1).cast("int").alias("n_turns"),
            F.col("id").alias("conv_seq"),
        )
        .select(
            "conv_id",
            "conv_seq",
            F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        )
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )
    skeleton = skeleton.withColumn(
        "ts",
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01 00:00:00"), "yyyy-MM-dd HH:mm:ss")
            + F.col("conv_seq") * 12
            + F.col("turn_idx")
        ),
    )
    gen_udf = bench_payload_udf if profile == "bench" else payload_udf
    payloads = skeleton.withColumn("_p", gen_udf(F.col("conv_id"), F.col("turn_idx")))
    return payloads.select(
        "conv_id",
        "turn_idx",
        F.col("_p.role").alias("role"),
        F.col("_p.text").alias("text"),
        F.col("_p.tool").alias("tool"),
        "ts",
    )
