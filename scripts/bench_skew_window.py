"""Window-operator behavior under planted key skew (VERDICT r04 #6).

sessionize / asof_join are ORDER-SENSITIVE per-key windows: they hash
ONE Exchange on the key and sort each key's history inside one task.
Unlike the extraction path, they cannot be salted — splitting a key
breaks lag/running-sum semantics — so the honest question is not "does
salting pay" but "how much does one pathological key degrade
wall-clock vs a uniform corpus of identical size, and does AQE's
skew handling do anything here".  (Answer expected from theory: AQE
skew-join splitting applies to JOIN inputs, not window Exchanges — a
window stage's hot partition is indivisible.)

Corpora (same total rows, same schema, same timestamps modulo key):
  - uniform: n_keys keys × (total / n_keys) events
  - skewed : ONE hot key holding half the events + the rest uniform

Measured per corpus, best-of-2 (host drift exceeds effect sizes):
  - session_rollup (lag + running sum + groupBy) forced via agg
  - asof_join (union-tag merge formulation) vs a sparse checkpoint
    table, forced via agg

Prints one JSON line; record both samples in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_TS = 1_700_000_000


def build_events(spark, total: int, hot_frac: float, n_cold_keys: int):
    """Event table: key, event_id, ts.  hot_frac of rows land on key
    'khot'; the rest spread uniformly over n_cold_keys keys.  Within a
    key, events are 30 s apart with a 2000 s jump every 40th event (so
    sessionize at gap 600 s makes real sessions)."""
    n_hot = int(total * hot_frac)
    n_cold = total - n_hot
    cold = spark.range(n_cold, numPartitions=16).select(
        F.format_string("k%05d", F.col("id") % n_cold_keys).alias("key"),
        (F.col("id") / n_cold_keys).cast("long").alias("seq"),
        F.col("id").alias("event_id"),
    )
    hot = spark.range(n_hot, numPartitions=16).select(
        F.lit("khot").alias("key"),
        F.col("id").alias("seq"),
        (F.col("id") + n_cold).alias("event_id"),
    )
    df = cold.unionByName(hot).select(
        "key",
        "event_id",
        F.timestamp_seconds(
            F.lit(BASE_TS)
            + F.col("seq") * 30
            + (F.col("seq") / 40).cast("long") * 2000
        ).alias("ts"),
    )
    return df.repartition(24, "key").persist()


def build_checkpoints(events, every: int = 50):
    return (
        events.filter(F.col("event_id") % every == 0)
        .select(
            "key",
            F.col("ts").alias("ckpt_ts"),
            F.col("event_id").alias("ckpt_id"),
        )
        .persist()
    )


def timed(fn):
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def main():
    from webtext_extraction_spark.operators.relational import asof_join, session_rollup
    from webtext_extraction_spark.session import get_spark

    cores = int(os.environ.get("SKEW_BENCH_CPUS", "8"))
    total = int(os.environ.get("SKEW_BENCH_EVENTS", "400000"))
    hot_frac = float(os.environ.get("SKEW_BENCH_HOT_FRAC", "0.5"))
    spark = get_spark(app_name="bench-skew-window", cores=cores)

    out_keys = max(1, int(4000 * (1 - hot_frac) / 0.5))
    corpora = {
        "uniform": build_events(spark, total, hot_frac=0.0, n_cold_keys=4000),
        "skewed": build_events(spark, total, hot_frac=hot_frac, n_cold_keys=out_keys),
    }
    for df in corpora.values():
        df.count()  # materialize outside timing

    out = {
        "metric": "window ops under planted key skew",
        "cores": cores,
        "events": total,
        "hot_frac": hot_frac,
    }
    for label, events in corpora.items():
        ckpts = build_checkpoints(events)
        ckpts.count()

        def run_session():
            return (
                session_rollup(events, "key", "ts", 600, "event_id")
                .agg(F.count("*"), F.sum("n_events"), F.sum("duration_us"))
                .collect()[0][0]
            )

        def run_asof():
            return (
                asof_join(
                    events, ckpts, "key", "ts", "ckpt_ts", ["ckpt_id"],
                    right_tiebreak="ckpt_id",
                )
                .agg(F.count("*"), F.sum(F.col("matched_ts_us") % 1_000_000_000))
                .collect()[0][0]
            )

        def run_session_bounded():
            return (
                session_rollup(events, "key", "ts", 600, "event_id", bounded=True)
                .agg(F.count("*"), F.sum("n_events"), F.sum("duration_us"))
                .collect()[0][0]
            )

        legs = (
            ("sessionize", run_session),
            ("sessionize_bounded", run_session_bounded),
            ("asof", run_asof),
        )
        for name, fn in legs:
            samples = [timed(fn) for _ in range(2)]
            assert len({n for _, n in samples}) == 1
            out[f"{label}_{name}_sec"] = [s for s, _ in samples]
            out[f"{label}_{name}_rows"] = samples[0][1]
        assert (
            out[f"{label}_sessionize_rows"] == out[f"{label}_sessionize_bounded_rows"]
        )
        ckpts.unpersist()

    for name in ("sessionize", "sessionize_bounded", "asof"):
        out[f"{name}_skew_penalty"] = round(
            min(out[f"skewed_{name}_sec"]) / min(out[f"uniform_{name}_sec"]), 2
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
