"""SparkSession factory with scale-oriented defaults.

Local mode here is a proxy for a multi-executor cluster; every conf is
chosen to survive a 1000-executor / 100 TB deployment:

- AQE on (runtime coalesce + skew-join splitting) — the Spark-native
  answer to the reference's straggler problem (SURVEY.md §2.9).
- Arrow batches capped at 512 rows (measured optimum for the
  arrow-native UDF on KB-scale fixture payloads; the Spark default
  10k-row batches would hold multi-MB Arrow buffers per python worker
  — SURVEY.md §4).  Jobs with multi-MB payloads tune DOWN via
  SPARK_ARROW_BATCH_ROWS / extra_conf (jobs/run_extract.py uses 256).
- shuffle partitions sized to cores locally; on a real cluster this is
  2-3× total executor cores (or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch sizing rule: target ~1-8 MB per batch.  512 rows is the
# measured optimum for the arrow-native UDF on KB-scale payloads
# (interleaved sweep, 45k bench turns x 32 cores: 512 beat 1024 by
# 5-8% in both adjacent pairs; 2048/4096 regress ~10%); jobs processing
# multi-MB payloads should tune DOWN further (256 or lower) to bound
# executor python memory — override via SPARK_ARROW_BATCH_ROWS or
# get_spark(extra_conf=...).
ARROW_BATCH_ROWS = int(os.environ.get("SPARK_ARROW_BATCH_ROWS", "512"))


def get_spark(
    app_name: str = "webtext-extraction",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
