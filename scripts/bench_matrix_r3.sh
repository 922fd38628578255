#!/bin/bash
# Round-3 TPU bench matrix: realistic acceptance p in {1.0, 0.9, 0.7} x
# {greedy, sampled}, ladder-3 (fp8 KV + sampled), and TTFT — each with
# 3 measurement windows + sigma (VERDICT round-2 item 1).
# Run: bash scripts/bench_matrix_r3.sh 2>&1 | tee /tmp/bench_matrix_r3.log
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  echo "=== $* ==="
  env "$@" timeout 2400 python bench.py
  echo "--- rc=$? ---"
}

run VOT_BENCH_ACCEPT=1.0                                        # greedy ceiling (headline)
run VOT_BENCH_ACCEPT=0.9
run VOT_BENCH_ACCEPT=0.7                                        # honest realistic mode
run VOT_BENCH_ACCEPT=1.0 VOT_BENCH_SAMPLED=1
run VOT_BENCH_ACCEPT=0.7 VOT_BENCH_SAMPLED=1
run VOT_BENCH_ACCEPT=1.0 VOT_BENCH_SAMPLED=1 VOT_BENCH_KV_DTYPE=fp8  # ladder-3
run VOT_BENCH_ACCEPT=0.7 VOT_BENCH_SAMPLED=1 VOT_BENCH_KV_DTYPE=fp8  # ladder-3 honest
run VOT_BENCH_MODE=ttft
echo "MATRIX DONE"
