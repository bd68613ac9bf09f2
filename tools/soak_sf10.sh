#!/bin/bash
# sf10 soak at HEAD (VERDICT r12 next-round #3): map_full + both
# whole-file ingest lanes + dedup_witness_clusters at 60M records /
# 500k documents — two orders above lock scale, post-batched_rows.
#
# Snapshots the official BENCH_full_last.json around the run (bench.py
# overwrites it; the sf10 artifact is BENCH_sf10_r13.json, never the
# official slot — see test_committed_official_artifact_window_ok).
set -euo pipefail
cd "$(dirname "$0")/.."

SF10_DIR=${SF10_DIR:-/root/repo/.scratch/sf10}
if [ ! -d "$SF10_DIR/documents.parquet" ]; then
  python tools/scale_testdata.py --src /root/testdata/sf0.1 \
    --dst "$SF10_DIR" --factor 100
fi

cp BENCH_full_last.json /tmp/official_bench_backup.json
trap 'cp /tmp/official_bench_backup.json BENCH_full_last.json' EXIT

SPARK_GRAFT_SF_DIR="$SF10_DIR" \
SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-2} \
SPARK_GRAFT_BENCH_ONLY=map_full_pipeline,ingest_iso2709_marc8,ingest_marcxml,dedup_witness_clusters \
python bench.py

cp BENCH_full_last.json BENCH_sf10_r13.json
echo "sf10 artifact -> BENCH_sf10_r13.json"
