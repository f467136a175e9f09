"""Heavy-payload scaling profile (VERDICT r02 #8).

The main scaling story (scripts/bench_scaling.py) is measured at
~6.5 KB/turn.  This profile re-runs the same paired-control
methodology with ~0.7 MB/turn pages (~100× heavier Arrow batches) —
the regime the session.py Arrow-batch docstring worries about — and
additionally A/B-tests maxRecordsPerBatch at the heavy row size
(32 vs 256 rows/batch ≈ 22 MB vs 180 MB per batch buffer).

Each (cores, batch_rows) level runs in a FRESH process (fresh JVM),
payload generation and the parquet write are excluded from timing, and
every Spark number is paired with a no-Spark multiprocessing control
taken immediately before it (host capacity drifts — see
BENCH/BASELINE.md methodology).

Prints one JSON line; writes BENCH/HEAVY_LAST_RUN.md.
Runtime ≈ 3-5 min.  Env: BENCH_HEAVY_CONVS (default 120).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LO, HI = 8, 32
BATCH_SWEEP = (32, 256)  # rows/batch A/B at the heavy row size


def _control_worker(seed: int, n_turns: int, out):
    # payloads built IN the child (pre-pickling 0.7 MB strings through
    # mp would dominate), generation excluded from the timed section
    from webtext_extraction_spark.fixtures_pages import heavy_payload_for
    from webtext_extraction_spark.kernel.extract import extract_payload

    payloads = [
        heavy_payload_for(f"conv{seed:06d}", t) for t in range(n_turns)
    ]
    t0 = time.time()
    for payload, tool in payloads:
        extract_payload(payload, tool)
    out.put((n_turns, time.time() - t0))


def hardware_control(k: int, turns_per_proc: int = 12) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_control_worker, args=(j, turns_per_proc, q))
        for j in range(k)
    ]
    for p in procs:
        p.start()
    # generation happens in-child before each worker's own timer; use
    # the per-worker timings (sum of work / max of spans ≈ saturated
    # throughput since starts align after similar gen time)
    spans = [q.get() for _ in range(k)]
    for p in procs:
        p.join()
    total = sum(s[0] for s in spans)
    wall = max(s[1] for s in spans)
    return total / wall


def run_level(cores: int, convs: int, batch_rows: int) -> dict:
    control_tps = hardware_control(cores)

    from pyspark.sql import functions as F

    from webtext_extraction_spark.operators.extraction import extract_turns
    from webtext_extraction_spark.plans.pipeline import extraction_pipeline
    from webtext_extraction_spark.session import get_spark
    from webtext_extraction_spark.sources.transcripts import synth_transcripts

    spark = get_spark(
        app_name=f"bench-heavy-{cores}",
        cores=cores,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(batch_rows)
        },
    )
    path = f"/tmp/bench_heavy_{os.getpid()}"
    try:
        # generation + write excluded from timing
        synth_transcripts(spark, num_conversations=convs, profile="heavy").write.mode(
            "overwrite"
        ).parquet(path)
        df = spark.read.parquet(path)
        turns = df.count()
        # warm python workers (partial pass), then timed passes forced
        # through an aggregate over the UDF output; best-of-2 per shape
        # (this host's capacity drifts)
        extract_turns(df.limit(4 * cores)).agg(
            F.sum(F.length("extracted_text"))
        ).collect()

        def timed(builder):
            best = None
            for _ in range(2):
                t0 = time.time()
                builder().agg(F.sum(F.length("extracted_text"))).collect()
                e = time.time() - t0
                best = e if best is None or e < best else best
            return best

        # A: raw scan splits (the KB-payload fast path, WRONG for heavy
        # rows); B: the auto plan — probe detects heavy rows and buys
        # the 3-tasks/core repartition
        raw_sec = timed(lambda: extract_turns(df))
        auto_sec = timed(lambda: extraction_pipeline(df))
    finally:
        shutil.rmtree(path, ignore_errors=True)
        spark.stop()
    return {
        "cores": cores,
        "batch_rows": batch_rows,
        "turns": turns,
        "turns_per_sec": turns / auto_sec,
        "extract_sec": auto_sec,
        "raw_scan_sec": raw_sec,
        "raw_scan_tps": turns / raw_sec,
        "control_tps": control_tps,
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        cores, convs, batch_rows = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        print(json.dumps(run_level(cores, convs, batch_rows)))
        return

    convs = int(os.environ.get("BENCH_HEAVY_CONVS", "120"))
    runs = []
    # batch A/B at HI, then LO at the first batch size for the scaling pair
    plan = [(HI, b) for b in BATCH_SWEEP] + [(LO, BATCH_SWEEP[0])]
    for cores, batch_rows in plan:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             str(cores), str(convs), str(batch_rows)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        runs.append(json.loads(line))
        print(f"# {runs[-1]}", file=sys.stderr)

    hi_a = next(r for r in runs if r["cores"] == HI and r["batch_rows"] == BATCH_SWEEP[0])
    hi_b = next(r for r in runs if r["cores"] == HI and r["batch_rows"] == BATCH_SWEEP[1])
    lo = next(r for r in runs if r["cores"] == LO)

    spark_speedup = hi_a["turns_per_sec"] / lo["turns_per_sec"]
    control_speedup = hi_a["control_tps"] / lo["control_tps"]
    plan_eff = spark_speedup / control_speedup
    control_ratio_hi = hi_a["turns_per_sec"] / hi_a["control_tps"]

    summary = {
        "metric": "heavy-payload scaling local[8]→local[32] (plan efficiency)",
        "value": round(plan_eff, 3),
        "unit": "ratio",
        "payload_mb_per_turn": 0.7,
        "turns": hi_a["turns"],
        "turns_per_sec_lo": round(lo["turns_per_sec"], 1),
        "turns_per_sec_hi": round(hi_a["turns_per_sec"], 1),
        "spark_speedup": round(spark_speedup, 2),
        "control_speedup": round(control_speedup, 2),
        "plan_efficiency": round(plan_eff, 3),
        "control_ratio_hi": round(control_ratio_hi, 3),
        "auto_vs_raw_scan_hi": round(
            hi_a["raw_scan_sec"] / hi_a["extract_sec"], 2
        ),
        "batch_ab_hi_tps": {
            str(BATCH_SWEEP[0]): round(hi_a["turns_per_sec"], 1),
            str(BATCH_SWEEP[1]): round(hi_b["turns_per_sec"], 1),
        },
    }
    print(json.dumps(summary))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/HEAVY_LAST_RUN.md", "w", encoding="utf-8") as f:
        f.write(
            f"""# Heavy-payload scaling — last run

~0.7 MB/turn article pages ({hi_a['turns']} turns), ~100× the main
bench's per-turn bytes; generation + parquet write excluded from
timing; paired no-Spark controls per level.

| metric | local[{LO}] b={BATCH_SWEEP[0]} | local[{HI}] b={BATCH_SWEEP[0]} | local[{HI}] b={BATCH_SWEEP[1]} |
| --- | --- | --- | --- |
| auto-plan wall (s) | {lo['extract_sec']:.2f} | {hi_a['extract_sec']:.2f} | {hi_b['extract_sec']:.2f} |
| raw-scan-splits wall (s) | {lo['raw_scan_sec']:.2f} | {hi_a['raw_scan_sec']:.2f} | {hi_b['raw_scan_sec']:.2f} |
| Spark turns/s (auto) | {lo['turns_per_sec']:.1f} | {hi_a['turns_per_sec']:.1f} | {hi_b['turns_per_sec']:.1f} |
| control turns/s | {lo['control_tps']:.1f} | {hi_a['control_tps']:.1f} | {hi_b['control_tps']:.1f} |

- spark speedup {HI}:{LO} = {summary['spark_speedup']}, control speedup =
  {summary['control_speedup']}, **plan efficiency = {summary['plan_efficiency']}**
- Spark/control ratio at local[{HI}] = {summary['control_ratio_hi']}
- heavy-row auto plan (probe → 3-tasks/core repartition) vs raw scan
  splits at local[{HI}]: **{summary['auto_vs_raw_scan_hi']}× faster**
- batch A/B at local[{HI}]: {BATCH_SWEEP[0]} rows → {summary['batch_ab_hi_tps'][str(BATCH_SWEEP[0])]} tps,
  {BATCH_SWEEP[1]} rows → {summary['batch_ab_hi_tps'][str(BATCH_SWEEP[1])]} tps

Reproduce: `python scripts/bench_heavy.py` (env BENCH_HEAVY_CONVS).
"""
        )


if __name__ == "__main__":
    main()
