"""Structured-Streaming surface for incremental extraction.

The reference is strictly batch (SURVEY.md §2.10) — this module is
engine-added surface: the same extraction operator applied to a
stream of transcript files (the shape an Iceberg incremental read or
a Kafka transcript feed would take).  Because extraction is per-turn
and stateless, the batch pandas UDF lifts to streaming unchanged —
no watermarks or state stores needed; exactly-once lands on the file
sink's commit log (or the Iceberg streaming sink in production).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from webtext_extraction_spark.operators.extraction import TRANSCRIPT_SCHEMA, extract_turns


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream(parquet) → extract → writeStream(parquet, append).

    ``available_now=True`` drains everything currently present and
    stops (micro-batch catch-up mode); False runs continuously.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    extracted = extract_turns(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
