#!/bin/bash
# Round-3 follow-up TPU configs: the fp8-KV ladder-3 pair (dtype string
# fixed) and the unfiltered-draft A/B on the sampled path.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  echo "=== $* ==="
  env "$@" timeout 2400 python bench.py
  echo "--- rc=$? ---"
}

run VOT_BENCH_ACCEPT=1.0 VOT_BENCH_SAMPLED=1 VOT_BENCH_KV_DTYPE=fp8   # ladder-3 ceiling
run VOT_BENCH_ACCEPT=0.7 VOT_BENCH_SAMPLED=1 VOT_BENCH_KV_DTYPE=fp8   # ladder-3 honest
run VOT_BENCH_ACCEPT=1.0 VOT_BENCH_SAMPLED=1 VOT_BENCH_DRAFT_FILTER=0 # draft-filter A/B
echo "MATRIX_B DONE"
