#!/bin/bash
# Ladder-3 pipeline-depth follow-up: slots6 measured +1.4% at block 16
# (r5_phase2.jsonl); probe slots8 and the final clean ladder-3 row.
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

L3B32="VOT_BENCH_KV_DTYPE=fp8 VOT_BENCH_BLOCK=32 VOT_BENCH_SAMPLED=1"
run ladder3_b32_slots6 $L3B32 VOT_ATTN_SLOTS=6
run ladder3_b32_clean $L3B32
run ladder3_b16_slots8 VOT_BENCH_KV_DTYPE=fp8 VOT_BENCH_BLOCK=16 VOT_BENCH_SAMPLED=1 VOT_ATTN_SLOTS=8
echo "PHASE2C DONE $(date +%H:%M:%S)" >&2
