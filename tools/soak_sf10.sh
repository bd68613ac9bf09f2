#!/bin/bash
# sf10 soak at HEAD (VERDICT r12 next-round #3): map_full + both
# whole-file ingest lanes + dedup_witness_clusters at 60M records /
# 500k documents — two orders above lock scale, post-batched_rows.
#
# Lanes run in SEPARATE bench invocations: each ingest lane's fixture
# corpus at 60M records is tens of GB (nested parquet ~15G, MARCXML
# ~45G, ISO2709 ~20G) and one process materializes every selected
# lane's fixture SIMULTANEOUSLY — the combined run filled the 78G tmp
# headroom and died ENOSPC (first attempt, r13). Per-process runs let
# atexit cleanup reclaim each corpus before the next lane builds.
#
# Snapshots the official BENCH_full_last.json around the run (bench.py
# overwrites it; the sf10 artifact is BENCH_sf10_r13.json, merged from
# the phases — never the official slot).
set -euo pipefail
cd "$(dirname "$0")/.."

SF10_DIR=${SF10_DIR:-/root/repo/.scratch/sf10}
if [ ! -d "$SF10_DIR/documents.parquet" ]; then
  python tools/scale_testdata.py --src /root/testdata/sf0.1 \
    --dst "$SF10_DIR" --factor 100
fi

cp BENCH_full_last.json /tmp/official_bench_backup.json
trap 'cp /tmp/official_bench_backup.json BENCH_full_last.json' EXIT

RUNS=${SPARK_GRAFT_BENCH_RUNS:-2}
rm -f /tmp/sf10_phase_*.json
i=0
for LANES in "map_full_pipeline,dedup_witness_clusters" \
             "ingest_iso2709_marc8" \
             "ingest_marcxml"; do
  i=$((i+1))
  echo "=== sf10 phase $i: $LANES ==="
  SPARK_GRAFT_SF_DIR="$SF10_DIR" \
  SPARK_GRAFT_BENCH_RUNS="$RUNS" \
  SPARK_GRAFT_BENCH_ONLY="$LANES" \
  python bench.py
  cp BENCH_full_last.json "/tmp/sf10_phase_$i.json"
done

python tools/merge_soak_phases.py \
  --out BENCH_sf10_r13.json /tmp/sf10_phase_*.json
echo "sf10 artifact -> BENCH_sf10_r13.json"
