#!/bin/bash
# Round-5 final config table (the BENCH/README rows), 3 windows each.
set -u
OUT=${OUT:-/root/repo/scripts/r5_final.jsonl}
cd /root/repo

run() {
    local tag=$1; shift
    echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
    local line
    line=$(env "$@" timeout 3600 python bench.py 2>>/root/repo/scripts/r5_final.log | tail -1)
    if [ -n "$line" ]; then
        echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
        echo "$tag -> $line" >&2
    else
        echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
        echo "$tag -> FAILED (see r5_final.log)" >&2
    fi
}

run headline_greedy VOT_BENCH_SPEC=oracle
run sampled_default VOT_BENCH_SAMPLED=1
run ladder3_b32 VOT_BENCH_KV_DTYPE=fp8 VOT_BENCH_BLOCK=32 VOT_BENCH_SAMPLED=1
run int8kv VOT_BENCH_KV_DTYPE=int8
run realistic_p07_k3 VOT_BENCH_ACCEPT=0.7 VOT_BENCH_SPEC_K=3
run realistic_p09_k4 VOT_BENCH_ACCEPT=0.9
echo "FINAL RECORDS DONE $(date +%H:%M:%S)" >&2
