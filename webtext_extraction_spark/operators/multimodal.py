"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct
(modality, width/height or sample_rate, codec).  The Spark-side
plumbing — schema, Arrow batching via mapInPandas, partition-friendly
batch shapes — is real and tested; the actual media decode is STUBBED
(this container has no image/audio libraries): ``decode_stub=True``
produces deterministic fake features (seeded by content hash), and
``decode_stub=False`` raises NotImplementedError where a real decoder
(PIL/torchaudio/ffmpeg) would plug in.

At 100 TB this is the standard shape: binary stays columnar
end-to-end (parquet → Arrow → pandas bytes) with no base64 detours,
feature extraction is mapInPandas so one task streams many batches,
and metadata predicates (modality, size) push down to the scan before
any Python runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_codec", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 8


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table.

    Payload bytes are the ASCII md5 hexdigest of ``media{i}`` repeated
    and truncated — deliberately ASCII-safe so the DuckDB oracle (whose
    ``md5`` accepts VARCHAR only) can rebuild the exact payload and
    replay the feature derivation end-to-end."""
    rows = []
    for i in range(n):
        seed_hex = hashlib.md5(f"media{i}".encode()).hexdigest()
        payload = (seed_hex * (3 + i % 8))[: 32 + (i % 5) * 16].encode("ascii")
        modality = ["image", "audio", "video"][i % 3]
        rows.append((i, modality, bytearray(payload), 16 + i % 64, 16 + (i * 7) % 64, "fake"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats
    from the content digest — stable across executors and runs."""
    digest = hashlib.md5(payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0).tolist()


def extract_media_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Batch shape: the iterator yields one output frame per input Arrow
    batch — constant memory per task regardless of partition size."""

    def run(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not available "
                    "in this environment; run with decode_stub=True"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "feature": payloads.map(lambda b: _fake_feature(bytes(b))),
                }
            )

    # metadata predicate stays Catalyst-side: nothing reaches Python
    # except rows that survive the pushed-down filter
    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_codec", StringType()),
    ]
)


def resize_media(
    df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """mapInPandas image-resize plumbing: binary in → binary out with
    updated dimension metadata, one output frame per Arrow batch
    (constant memory per task).  A real implementation decodes with
    PIL/ffmpeg, resizes, re-encodes; this container has neither, so
    ``decode_stub=True`` produces a deterministic ASCII stand-in
    (md5 hexdigest of payload + target dims — ASCII so the DuckDB
    oracle can replay the derivation), and ``decode_stub=False``
    raises where the decoder would plug in.  Non-image rows pass
    through untouched (resize is an image/video-frame operation)."""

    def run(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires PIL/ffmpeg — not available "
                    "in this environment; run with decode_stub=True"
                )
            out_payloads = []
            out_w, out_h = [], []
            for payload, modality, w, h in zip(
                pdf["payload"], pdf["modality"], pdf["meta_width"], pdf["meta_height"]
            ):
                if modality == "image":
                    digest = hashlib.md5(
                        bytes(payload) + f"{target_width}x{target_height}".encode()
                    ).hexdigest()
                    out_payloads.append(digest.encode("ascii"))
                    out_w.append(target_width)
                    out_h.append(target_height)
                else:
                    out_payloads.append(bytes(payload))
                    out_w.append(w)
                    out_h.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out_payloads,
                    "meta_width": pd.Series(out_w, dtype="int32"),
                    "meta_height": pd.Series(out_h, dtype="int32"),
                    "meta_codec": pdf["meta_codec"],
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* plumbing: explodes a frame index per
    sampled frame (decode stubbed, indices real) — demonstrates the
    fan-out schema a real sampler would feed."""
    return (
        df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.lit(3))),
        )
        .withColumn("sample_every", F.lit(every_n))
        .select("media_id", "frame_idx", "sample_every", "meta_codec")
    )
