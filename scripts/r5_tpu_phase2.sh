#!/bin/bash
# Round-5 TPU phase 2 (run AFTER spec_gate_matrix_r5.sh):
#   A. ladder-3 semaphore-group probe (VERDICT r4 item 3): fp8 KV
#      block 16 sampled, VOT_ATTN_SEM_GROUP in {0 shared, 2, 1 percopy}
#      — watch for sflag compile failures at 1
#   B. sampled 4-ary threshold search A/B (VERDICT r4 item 4) at the
#      sampled headline shape: arity 2 baseline / arity 4 / arity 4+bind
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
run ladder3_semshared $L3
run ladder3_semgroup2 $L3 VOT_ATTN_SEM_GROUP=2
run ladder3_sempercopy $L3 VOT_ATTN_SEM_GROUP=1

run sampled_arity2 VOT_BENCH_SAMPLED=1
run sampled_arity4 VOT_BENCH_SAMPLED=1 VOT_THRESH_ARITY=4
run sampled_arity4_bind VOT_BENCH_SAMPLED=1 VOT_THRESH_ARITY=4 VOT_THRESH_BIND=1
echo "PHASE2 DONE $(date +%H:%M:%S)" >&2
