"""WARC/WET ingestion — the Common Crawl text format, the standard
100 TB-scale input of a webtext pipeline (the reference fetches live
pages one URL at a time, W:web_text_extractor_ver1.5.py:300+; at
corpus scale the same documents arrive as WET conversion records).

A WET file is a sequence of records::

    WARC/1.0\r\n
    WARC-Type: conversion\r\n
    WARC-Target-URI: http://...\r\n
    WARC-Date: 2013-12-04T15:30:35Z\r\n
    WARC-Record-ID: <urn:uuid:...>\r\n
    Content-Length: 1234\r\n
    \r\n
    <plain text>\r\n
    \r\n

Design (Spark-first): records are split by the DataFrame text
reader's multi-character ``lineSep`` (``\r\n\r\nWARC/1.0\r\n`` — the
inter-record boundary), so splitting happens in the scan itself with
NO Python and no whole-file driver reads; gzipped ``.wet.gz`` files
decompress transparently (non-splittable per file, the Common Crawl
layout's own parallelism unit is the file).  Header parsing is pure
column expressions (``split`` limit-2 on the first blank line +
``regexp_extract`` per field) — whole-stage codegen end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# inter-record boundary: the blank line closing a record's payload
# plus the next record's version line.  The FIRST record keeps its
# leading "WARC/1.0\r\n" (no preceding boundary) — parse strips it.
WET_RECORD_DELIM = "\r\n\r\nWARC/1.0\r\n"


def _field(header: Column, name: str) -> Column:
    v = F.regexp_extract(header, rf"{name}:[ \t]*(\S+)", 1)
    return F.nullif(v, F.lit(""))


def parse_wet_records(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse raw WET record strings (one per row, as produced by the
    ``lineSep`` scan) into typed columns.

    Robustness contract: a record is header + first blank line +
    body; CRLF and bare-LF files both parse (``\\r?\\n``), a missing
    header field is NULL (not ''), a record with no blank line is
    all-header with ``text`` NULL, and trailing record terminators
    (``[\\r\\n]+`` at end of body) are stripped — ``Content-Length``
    is reported as-declared, not recomputed, so audits can compare.

    Output: (warc_type, url, warc_date, record_id, content_length
    long, text).
    """
    rec = F.regexp_replace(F.col(value_col), r"\AWARC/1\.0\r?\n", "")
    parts = F.split(rec, r"\r?\n\r?\n", 2)
    header = F.element_at(parts, 1)
    body = F.when(F.size(parts) >= 2, F.element_at(parts, 2))
    return df.select(
        _field(header, "WARC-Type").alias("warc_type"),
        _field(header, "WARC-Target-URI").alias("url"),
        _field(header, "WARC-Date").alias("warc_date"),
        _field(header, "WARC-Record-ID").alias("record_id"),
        _field(header, "Content-Length").cast("long").alias("content_length"),
        F.regexp_replace(body, r"[\r\n]+\Z", "").alias("text"),
    )


def open_wet(
    spark: SparkSession, path: str, skip_warcinfo: bool = True
) -> DataFrame:
    """Read WET files (plain or ``.gz``) into (warc_type, url,
    warc_date, record_id, content_length, text).

    ``skip_warcinfo`` drops the per-file ``warcinfo`` prologue record
    (file metadata, no document).  Scale: one task per (file, split);
    gzip members are per-file tasks — Common Crawl ships ~1 GB
    ``.wet.gz`` segments precisely so the FILE is the parallelism
    unit, which this reader inherits with no extra machinery.
    """
    raw = spark.read.option("lineSep", WET_RECORD_DELIM).text(path)
    out = parse_wet_records(raw)
    if skip_warcinfo:
        out = out.filter(
            F.coalesce(F.col("warc_type"), F.lit("")) != "warcinfo"
        )
    return out
