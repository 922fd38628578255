#!/bin/bash
# Ladder-3 recovery probes beyond the semaphore hypothesis (refuted in
# phase 2): fold kernel, deeper pipeline, block 32.
set -u
OUT=${OUT:-/root/repo/scripts/r5_phase2.jsonl}
cd /root/repo

run() {
    local tag=$1; shift
    echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
    local line
    line=$(env "$@" timeout 3600 python bench.py 2>>/root/repo/scripts/r5_phase2.log | tail -1)
    if [ -n "$line" ]; then
        echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
        echo "$tag -> $line" >&2
    else
        echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
        echo "$tag -> FAILED (see r5_phase2.log)" >&2
    fi
}

L3="VOT_BENCH_KV_DTYPE=fp8 VOT_BENCH_BLOCK=16 VOT_BENCH_SAMPLED=1"
run ladder3_fold $L3 VOT_ATTN_FOLD=1
run ladder3_slots6 $L3 VOT_ATTN_SLOTS=6
run ladder3_block32 VOT_BENCH_KV_DTYPE=fp8 VOT_BENCH_BLOCK=32 VOT_BENCH_SAMPLED=1
echo "PHASE2B DONE $(date +%H:%M:%S)" >&2
