"""Per-leg isolation harness for the optimization round (guide §1.4).

NOT the driver bench — bench.py stays frozen.  This file times each
bench leg separately (same inputs, same actions as bench.py so numbers
are comparable), labels jobs, and optionally dumps
``explain("formatted")`` per leg to plans/r06/.

Usage:
  python bench_extra.py [--plans BEFORE|AFTER] [--legs a,b,c] [--n N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="suffix: dump plans to plans/r06/<leg>_<suffix>.txt")
    ap.add_argument("--legs", default=None)
    ap.add_argument("--n", type=int, default=3, help="timed attempts per leg")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from bench import build_transcripts
    from webtext_extraction_spark.operators import dedup, similarity, textstats
    from webtext_extraction_spark.operators.extraction import extract_turns
    from webtext_extraction_spark.operators.partitioning import detect_hot_keys
    from webtext_extraction_spark.session import get_spark

    spark = get_spark(app_name=f"bench-extra-{cores}", cores=cores)

    transcripts = build_transcripts(spark, sf).persist()
    n_turns = transcripts.count()
    warmup = extract_turns(transcripts.limit(512))
    warmup.agg(F.sum(F.length("extracted_text"))).collect()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs_capped = docs.filter(F.col("doc_id") < 300)

    legs = {
        "hot_key_detect": (
            lambda: detect_hot_keys(transcripts, sample_fraction=0.1),
            None,
        ),
        "extract_pipeline": (
            lambda: extract_turns(transcripts).agg(
                F.count("*").alias("n"),
                F.sum(F.length("extracted_text")).alias("bytes_out"),
                F.countDistinct("status").alias("n_status"),
            ).collect(),
            lambda: extract_turns(transcripts).agg(
                F.count("*"), F.sum(F.length("extracted_text")),
                F.countDistinct("status")),
        ),
        "dedup_minhash_lsh_first300": (
            lambda: dedup.minhash_lsh_pairs(
                docs_capped, "doc_id", "text", num_hashes=8, bands=4,
                jaccard_threshold=0.7).count(),
            lambda: dedup.minhash_lsh_pairs(
                docs_capped, "doc_id", "text", num_hashes=8, bands=4,
                jaccard_threshold=0.7),
        ),
        "dedup_simhash": (
            lambda: dedup.with_simhash(docs, "text").agg(F.sum("simhash")).collect(),
            lambda: dedup.with_simhash(docs, "text").agg(F.sum("simhash")),
        ),
        "text_profile": (
            lambda: textstats.text_profile(docs, "doc_id", "text")
            .agg(F.sum("fingerprint"), F.sum("ws_tokens")).collect(),
            lambda: textstats.text_profile(docs, "doc_id", "text")
            .agg(F.sum("fingerprint"), F.sum("ws_tokens")),
        ),
        "sim_cosine_topk": (
            lambda: similarity.cosine_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10).count(),
            lambda: similarity.cosine_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10),
        ),
        "sim_lsh_ann_topk": (
            lambda: similarity.lsh_ann_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10).count(),
            lambda: similarity.lsh_ann_topk(emb, query_ids=[0, 1, 2, 3, 4], k=10),
        ),
    }
    pick = args.legs.split(",") if args.legs else list(legs)

    out = {"turns": n_turns, "cores": cores, "sf": sf, "legs": {}}
    for name in pick:
        fn, dffn = legs[name]
        if args.plans and dffn is not None:
            os.makedirs("plans/r06", exist_ok=True)
            df = dffn()
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as fh:
                fh.write(txt)
        spark.sparkContext.setJobDescription(f"leg:{name}")
        vals = []
        for _ in range(args.n):
            t0 = time.time()
            fn()
            vals.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out["legs"][name] = {"min": min(vals), "samples": vals}

    transcripts.unpersist()
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
