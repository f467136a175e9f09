"""Streaming extraction: file-source micro-batches produce the same
rows as the batch operator, with exactly-once on resume."""

from pyspark.sql import functions as F

from webtext_extraction_spark.operators.extraction import extract_turns
from webtext_extraction_spark.sources.transcripts import synth_transcripts
from webtext_extraction_spark.streaming.stream import stream_extract


def test_stream_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    transcripts = synth_transcripts(spark, num_conversations=12)
    transcripts.write.mode("overwrite").parquet(inp)

    q = stream_extract(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(300)

    streamed = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .collect()
    )
    batch = (
        extract_turns(spark.read.parquet(inp))
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .collect()
    )
    assert sorted(streamed) == sorted(batch)

    # restart with same checkpoint: no new input → no duplicates
    q2 = stream_extract(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    again = spark.read.parquet(out).count()
    assert again == len(batch)
