"""Time every queries() entry on Spark (noop sink, guide §1.4) — the
optimization round's breadth probe.  Not the driver bench; identifies
which declared queries burn the most compute so optimization effort is
spent where the time is.

Usage: python scripts/bench_queries_r06.py [sf_dir] [attempts]
Prints one line per query: name best_sec [samples]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from webtext_extraction_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:]) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="bench-queries-r06")
    results = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"q:{name}")
        vals = []
        try:
            for _ in range(attempts):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                vals.append(round(time.time() - t0, 3))
        except Exception as e:  # noqa: BLE001
            print(f"{name} ERROR {type(e).__name__}: {e}", flush=True)
            continue
        finally:
            spark.sparkContext.setJobDescription(None)
        results[name] = vals
        print(f"{name} {min(vals):.3f} {vals}", flush=True)
    print(json.dumps({k: min(v) for k, v in sorted(results.items(), key=lambda kv: -min(kv[1]))}))
    spark.stop()


if __name__ == "__main__":
    main()
