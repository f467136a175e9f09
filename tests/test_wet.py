"""WET source: file-based reading, header robustness, gzip."""
import gzip
import os

from pyspark.sql import functions as F

from webtext_extraction_spark.sources.wet import open_wet, parse_wet_records


def _record(uri, text, rid="<urn:uuid:x>", extra="", typ="conversion"):
    return (
        "WARC/1.0\r\n"
        f"WARC-Type: {typ}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + "WARC-Date: 2025-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: {rid}\r\n"
        + extra
        + f"Content-Length: {len(text)}\r\n\r\n"
        + text
    )


def test_open_wet_multi_record_and_warcinfo(spark, tmp_path):
    d = str(tmp_path / "wet1")
    os.makedirs(d)
    content = "\r\n\r\n".join(
        [
            _record(None, "software: test-writer", typ="warcinfo"),
            _record("http://a.test/1", "hello world\nsecond line"),
            _record("http://a.test/2", "second doc"),
        ]
    ) + "\r\n\r\n"
    open(os.path.join(d, "f.wet"), "w").write(content)
    got = {r["url"]: r.asDict() for r in open_wet(spark, d).collect()}
    assert set(got) == {"http://a.test/1", "http://a.test/2"}
    assert got["http://a.test/1"]["text"] == "hello world\nsecond line"
    assert got["http://a.test/1"]["content_length"] == len(
        "hello world\nsecond line"
    )
    assert got["http://a.test/2"]["warc_type"] == "conversion"
    # warcinfo prologue kept when asked
    allr = open_wet(spark, d, skip_warcinfo=False).collect()
    assert len(allr) == 3


def test_open_wet_gzip_and_lf_only(spark, tmp_path):
    d = str(tmp_path / "wet2")
    os.makedirs(d)
    # bare-LF file (some writers emit LF): parse still splits headers
    lf = _record("http://b.test/1", "lf body text").replace("\r\n", "\n")
    with gzip.open(os.path.join(d, "f.wet.gz"), "wt") as f:
        f.write(lf)
    got = open_wet(spark, d).collect()
    assert len(got) == 1
    assert got[0]["url"] == "http://b.test/1"
    assert got[0]["text"] == "lf body text"


def test_parse_wet_missing_fields_and_headerless_body(spark):
    rows = [
        ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody only\r\n",),
        ("WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 4\r\n",),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = parse_wet_records(df).collect()
    by_type = sorted(got, key=lambda r: (r["content_length"] or 0))
    assert by_type[0]["url"] is None and by_type[0]["text"] == "body only"
    # no blank line: all-header record, text NULL
    assert by_type[1]["content_length"] == 4 and by_type[1]["text"] is None
