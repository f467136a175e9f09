"""Power-of-two histogram quantile sketch (textstats.value_histogram /
hist_merge / hist_quantiles): bin arithmetic vs python, the quantile
envelope guarantee, merge≡union-build, NULL/negative exclusion, and
the single-shuffle plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from webtext_extraction_spark.operators.textstats import (
    hist_merge,
    hist_quantiles,
    value_histogram,
)


def _rows(seed=5, n=2000):
    rng = random.Random(seed)
    return [("g%d" % (i % 3), rng.randint(0, 5000)) for i in range(n)]


def test_bins_match_python(spark):
    vals = [0, 1, 2, 3, 6, 7, 14, 15, 100, 2**40]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    got = {r["bin"]: (r["bin_lo"], r["bin_hi"], r["cnt"]) for r in
           value_histogram(df, "v", ["g"]).collect()}
    exp = {}
    for v in vals:
        b = (v + 1).bit_length() - 1
        lo, hi = (1 << b) - 1, (1 << (b + 1)) - 2
        assert lo <= v <= hi  # the bin really covers its value
        cnt = exp.get(b, (lo, hi, 0))[2] + 1
        exp[b] = (lo, hi, cnt)
    assert got == exp


def test_null_and_negative_excluded(spark):
    df = spark.createDataFrame([(1,), (None,), (-3,)], "v int")
    got = value_histogram(df, "v").collect()
    assert len(got) == 1 and got[0]["cnt"] == 1


def test_quantile_envelope_guarantee(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "g string, v int")
    h = value_histogram(df, "v", ["g"])
    qs = [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100), (1, 1)]
    res = hist_quantiles(h, qs, ["g"]).collect()
    assert len(res) == 3 * len(qs)
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for vs in by_g.values():
        vs.sort()
    for r in res:
        vs = by_g[r["g"]]
        rank = (len(vs) * r["q_num"] + r["q_den"] - 1) // r["q_den"]
        assert r["n"] == len(vs) and r["rank"] == rank
        true_val = vs[rank - 1]
        assert r["est_lo"] <= true_val <= r["est_hi"]
        assert r["est_hi"] <= 2 * r["est_lo"] + 1  # log-bin rel. error


def test_global_quantiles_no_group(spark):
    df = spark.createDataFrame([(v,) for _, v in _rows()], "v int")
    res = {(r["q_num"], r["q_den"]): r for r in
           hist_quantiles(value_histogram(df, "v"), [(1, 2)]).collect()}
    assert res[(1, 2)]["n"] == 2000 and res[(1, 2)]["rank"] == 1000


def test_merge_equals_union_build(spark):
    rows = _rows(seed=9)
    df = spark.createDataFrame(rows, "g string, v int")
    a = value_histogram(df.filter(F.col("v") < 2500), "v", ["g"])
    b = value_histogram(df.filter(F.col("v") >= 2500), "v", ["g"])
    merged = {(r["g"], r["bin"]): (r["bin_lo"], r["bin_hi"], r["cnt"])
              for r in hist_merge(a, b).collect()}
    whole = {(r["g"], r["bin"]): (r["bin_lo"], r["bin_hi"], r["cnt"])
             for r in value_histogram(df, "v", ["g"]).collect()}
    assert merged == whole


def test_quantile_validation(spark):
    df = spark.createDataFrame([(1,)], "v int")
    h = value_histogram(df, "v")
    for bad in ([(0, 4)], [(5, 4)], [(1, 0)]):
        with pytest.raises(ValueError, match="quantiles"):
            hist_quantiles(h, bad)
    with pytest.raises(ValueError, match="histogram"):
        hist_merge()


def test_histogram_single_shuffle_plan(spark):
    """The sketch build is ONE groupBy: exactly one Exchange, no Sort,
    no join — the shape that holds at 100 TB."""
    df = spark.createDataFrame(_rows(), "g string, v int")
    plan = value_histogram(df, "v", ["g"])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("Exchange") <= 2  # formatted lists tree + detail
    assert "Join" not in plan
