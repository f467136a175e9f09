"""jobs/run_curate.py CLI: gate composition end-to-end in-process
(the spark-submit deploy path itself is exercised by
scripts/smoke_submit.sh)."""

import sys

from pyspark.sql import functions as F


def _docs(spark, tmp_path):
    rows = []
    for i in range(40):
        text = f"the quick brown fox number {i} jumps over the lazy dog again and again"
        if i % 10 == 0:
            text = "dup dup dup"  # exact dup cluster, low quality
        if i == 7:
            text += " contact me at leak@example.com"
        rows.append((i, text))
    p = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(p)
    return p


def test_run_curate_gates_compose(spark, tmp_path, monkeypatch):
    from jobs import run_curate

    # the job builds its own session via getOrCreate() — it reuses the
    # test session
    inp = _docs(spark, tmp_path)
    out = str(tmp_path / "curated")
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.stop", lambda self: None
    )  # keep the shared fixture session alive
    run_curate.main(
        [
            "--input", inp,
            "--output", out,
            "--lang", "en",
            "--min-quality", "0.3",
            "--min-logprob", "-12.0",
            "--dedup", "exact",
            "--scrub-pii",
        ]
    )
    got = spark.read.parquet(out)
    rows = {r["doc_id"]: r for r in got.collect()}
    # exact-dup losers dropped: of docs 0,10,20,30 exactly one (the
    # min id, 0) may survive — and "dup dup dup" fails the lang gate
    # anyway, so none survive; normal docs survive
    assert all(i not in rows for i in (10, 20, 30))
    assert 1 in rows and 7 in rows
    # pii scrubbed in the surviving text
    assert "leak@example.com" not in rows[7]["text"]
    assert "<EMAIL>" in rows[7]["text"]
    assert rows[7]["n_email"] == 1
    # quality/lang columns rode along
    assert rows[1]["lang_pred"] == "en"


def test_run_curate_substring_dedup_rewrites_text(spark, tmp_path, monkeypatch):
    from jobs import run_curate

    rows = [
        (0, "alpha unique start one two three four five end0"),
        (1, "beta prefix one two three four five suffix1"),
        (2, "gamma fully distinct content with no shared runs"),
    ]
    inp = str(tmp_path / "ss_in")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(inp)
    out = str(tmp_path / "ss_out")
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    run_curate.main(
        ["--input", inp, "--output", out, "--dedup", "substring", "--substring-n", "5"]
    )
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 3  # substring mode drops no docs
    assert "one two three four five" in got[0]["text"]      # first occurrence kept
    assert "one two three four five" not in got[1]["text"]  # later occurrence stripped
    assert got[1]["text"] == "beta prefix suffix1"
    assert got[2]["removed_frac"] == 0.0
