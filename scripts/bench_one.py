"""Run one parallelism level of the scaling bench in a fresh process
(fresh JVM — sequential SparkSessions in one JVM inherit heap/GC state
that skews the second measurement).

Also measures the no-Spark hardware control (same kernel, bare
multiprocessing at the same parallelism) IMMEDIATELY BEFORE the Spark
run: this box's effective capacity drifts ±2× over minutes (shared
host), so each Spark number is paired with a control taken under the
same conditions and the scaling claim uses the ratio.

Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _sf_from_dir, run_once


def _control_worker(payloads, out):
    from webtext_extraction_spark.kernel.extract import extract_payload

    t0 = time.time()
    for payload, tool in payloads:
        extract_payload(payload, tool)
    out.put((len(payloads), time.time() - t0))


def _build_payloads(n_turns: int, seed: int):
    from webtext_extraction_spark.fixtures_pages import bench_payload_for as payload_for

    payloads = []
    i = seed * 10000
    while len(payloads) < n_turns:
        cid = f"conv{i:06d}"
        for t in range(1 + i % 12):
            payloads.append(payload_for(cid, t))
        i += 1
    return payloads


def hardware_control(k: int, turns_per_proc: int = 800, repeats: int = 2) -> float:
    shards = [_build_payloads(turns_per_proc, j) for j in range(k)]
    best = 0.0
    for _ in range(repeats):
        q = mp.Queue()
        procs = [
            mp.Process(target=_control_worker, args=(shards[j], q)) for j in range(k)
        ]
        t0 = time.time()
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        wall = time.time() - t0
        total = sum(q.get()[0] for _ in range(k))
        best = max(best, total / wall)
    return best


def main():
    cores = int(sys.argv[1])
    convs = int(sys.argv[2])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = _sf_from_dir(sf_dir)
    control_tps = hardware_control(cores)
    r = run_once(cores, sf_dir, sf, convs, ops=False)
    print(
        json.dumps(
            {
                "cores": cores,
                "turns": r["turns"],
                "turns_per_sec": r["turns_per_sec"],
                "extract_sec": r["timings"]["extract_pipeline"],
                "control_tps": control_tps,
            }
        )
    )


if __name__ == "__main__":
    main()
