"""Seeded FOREIGN corpus generator for the oracle soak.

The driver gate (scripts/check_oracles.py at /root/testdata/sf0.01)
proves Spark == DuckDB on the curated corpus; this generator produces
a hostile corpus with the same table shapes so the SAME gate can be
replayed on data the queries were never tuned against:

  * documents: NULL text, empty text, exact dups, planted shared
    phrases, CJK runs, 1-word docs (seed 99 caught 8 divergences:
    NULL-text fingerprint/simhash NULL-propagation, minhash 0/0 ANSI
    crash on colliding empties, ngram-Jaccard NULL-shingle pairing,
    derived-view concat(NULL) row loss)
  * embeddings: clustered vectors PLUS exact dups and an all-zero
    vector (caught the cosine divide-by-zero family: Spark ANSI
    errors where DuckDB silently yields NULL)
  * events: equal-timestamp ties, micro gaps, day-scale gaps

Usage:
    python scripts/gen_random_corpus.py SEED OUTDIR
    python scripts/check_oracles.py OUTDIR      # expect N ok, 0 failing

Run at least seeds {99, 7, 123} (the r4 soak set) after touching any
operator arithmetic; a new seed is a new corpus.  Tables the gate
never reads (TPC-H dims) are copied from sf0.001 because check_oracles
registers views for all ten.
"""
import datetime
import os
import random
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TESTDATA = "/root/testdata/sf0.001"


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 99
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/randsf{seed}"
    rnd = random.Random(seed)
    npr = np.random.RandomState(seed)
    os.makedirs(out, exist_ok=True)

    # documents: mixed-language word soup with planted dup structure,
    # nulls, empties, unicode, repeated phrases
    vocab = ["w%d" % i for i in range(400)] + ["the", "a", "of", "to", "in", "is"]
    jp = ["日本", "テキスト", "抽出", "変換", "処理"]
    phrases = [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(3, 8))) for _ in range(12)
    ]
    docs_text, docs_lang, docs_src = [], [], []
    for _i in range(600):
        r = rnd.random()
        if r < 0.02:
            t = None
        elif r < 0.04:
            t = ""
        elif r < 0.10:
            t = docs_text[rnd.randrange(len(docs_text))] if docs_text else "dup seed"
        else:
            parts = [rnd.choice(vocab) for _ in range(rnd.randint(1, 120))]
            if rnd.random() < 0.4:
                parts.insert(rnd.randrange(len(parts)), rnd.choice(phrases))
            if rnd.random() < 0.15:
                parts.extend(rnd.choice(jp) for _ in range(rnd.randint(5, 30)))
            t = " ".join(parts)
        docs_text.append(t)
        docs_lang.append(rnd.choice(["en", "ja", "xx"]))
        docs_src.append("src%d" % rnd.randrange(4))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(600), pa.int64()),
                "text": pa.array(docs_text, pa.string()),
                "lang": pa.array(docs_lang, pa.string()),
                "source": pa.array(docs_src, pa.string()),
                "n_chars": pa.array([len(t) if t else 0 for t in docs_text], pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )

    # embeddings: clustered float32 vectors + exact dups + a zero vector
    base = npr.randn(8, 64).astype(np.float32) * 3
    vecs = []
    for i in range(600):
        c = base[i % 8] + npr.randn(64).astype(np.float32) * 0.4
        if i % 37 == 0 and i > 0:
            c = np.array(vecs[i - 1], dtype=np.float32)  # exact dup
        if i == 100:
            c = np.zeros(64, dtype=np.float32)  # zero-norm: cosine edge
        vecs.append(np.round(c, 6).tolist())
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(600), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([i % 8 for i in range(600)], pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )

    # events: bursty per-user timelines with equal-ts ties and micro gaps
    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    t = 0
    for eid in range(1200):
        t += rnd.choice([0, 1, 40, 1_000_000, 50_000_000, 90_000_000_000])
        evs.append(
            (
                eid,
                t0 + datetime.timedelta(microseconds=t),
                rnd.randrange(40),
                rnd.choice(["view", "click", "error"]),
                round(rnd.uniform(0, 100), 2),
                '{"k": %d}' % rnd.randrange(99),
            )
        )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([e[0] for e in evs], pa.int64()),
                "ts": pa.array([e[1] for e in evs], pa.timestamp("us")),
                "user_id": pa.array([e[2] for e in evs], pa.int64()),
                "event_type": pa.array([e[3] for e in evs], pa.string()),
                "value": pa.array([e[4] for e in evs], pa.float64()),
                "props": pa.array([e[5] for e in evs], pa.string()),
            }
        ),
        f"{out}/events.parquet",
    )

    for tname in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(f"{TESTDATA}/{tname}.parquet", f"{out}/{tname}.parquet")
    print("random corpus written:", out, "seed", seed)


if __name__ == "__main__":
    main()
