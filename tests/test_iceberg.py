"""Jar-gated Iceberg execution test (VERDICT r02 #5).

``open_transcripts(..., "iceberg")`` and the lineage layout's
one-Iceberg-transaction story (plans/lineage.py module docstring) are
production paths this sandbox cannot run — no Iceberg runtime jars, no
network to fetch them.  This test makes that gap VISIBLE instead of
silent: it runs for real whenever ``iceberg-spark-runtime`` is on the
classpath and reports an explicit skip (not a pass) when it is not.

To run it for real:
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
or drop the jar into $SPARK_HOME/jars and re-run pytest.
"""

import pytest


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@pytest.mark.iceberg
def test_open_transcripts_iceberg_roundtrip(spark, tmp_path):
    if not _iceberg_on_classpath(spark):
        pytest.skip(
            "Iceberg runtime jars not on the classpath — "
            "open_transcripts('iceberg') is experimental/untested in this "
            "sandbox (sources/transcripts.py docstring)"
        )

    from webtext_extraction_spark.sources.transcripts import (
        open_transcripts,
        synth_transcripts,
    )

    # local hadoop catalog over tmp_path (catalog confs resolve lazily,
    # so runtime set works on an existing session)
    spark.conf.set(
        "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))

    t = synth_transcripts(spark, num_conversations=20)
    t.writeTo("ice.db.transcripts").using("iceberg").createOrReplace()

    got = open_transcripts(spark, "ice.db.transcripts", "iceberg")
    expected = sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.collect()
    )
    assert (
        sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in got.collect())
        == expected
    )

    # snapshot id exists — the input_snapshot the lineage rows would pin
    snaps = spark.sql(
        "SELECT snapshot_id FROM ice.db.transcripts.snapshots"
    ).collect()
    assert len(snaps) >= 1
