#!/usr/bin/env bash
# spark-submit deploy-path smoke: package the engine, ship it via
# --py-files, run the resumable bucketed extraction job (north rule:
# "runs via spark-submit --py-files on multi-executor clusters").
set -euo pipefail
cd "$(dirname "$0")/.."
workdir=$(mktemp -d)
python - <<EOF
import shutil
shutil.make_archive("$workdir/engine", "zip", root_dir=".", base_dir="webtext_extraction_spark")
EOF
spark-submit --master "local[8]" --py-files "$workdir/engine.zip" \
  --conf spark.ui.enabled=false \
  jobs/run_extract.py --synth-convs 60 --output "$workdir/out" --num-buckets 8
test -d "$workdir/out/_lineage" && test -d "$workdir/out/data"
echo "SMOKE OK: $(ls "$workdir/out")"
# curation job over the driver-provided documents table (all gates on)
spark-submit --master "local[8]" --py-files "$workdir/engine.zip" \
  --conf spark.ui.enabled=false \
  jobs/run_curate.py --input /root/testdata/sf0.001/documents.parquet \
  --output "$workdir/curated" --lang en --min-quality 0.5 \
  --max-dup-frac 0.9 --dedup neardup --scrub-pii
test -d "$workdir/curated"
python - <<EOF
import duckdb
n = duckdb.sql("SELECT count(*) FROM read_parquet('$workdir/curated/*.parquet')").fetchone()[0]
assert n > 0, "curation smoke produced zero rows"
print(f"SMOKE OK: curated {n} rows")
EOF
rm -rf "$workdir"
