#!/bin/bash
# Round-5 spec-gate evidence matrix (VERDICT r4 item 1):
#   - int4 NON-SPEC baseline at the headline shape (B=32, M=8, block 128)
#   - K sweep {2,3,4,6} at realistic acceptance (p=0.7 -> measured 0.44,
#     p=0.9 -> measured 0.78), B=32
#   - ratio-optimal small-batch points (B=8) for the same configs
# One TPU job at a time, each a fresh process under timeout; JSON lines
# append to scripts/spec_gate_r5.jsonl with the config echoed.
set -u
OUT=${OUT:-/root/repo/scripts/spec_gate_r5.jsonl}
cd /root/repo

run() {
    local tag=$1; shift
    echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
    local line
    line=$(env "$@" timeout 3600 python bench.py 2>>/root/repo/scripts/spec_gate_r5.log | tail -1)
    if [ -n "$line" ]; then
        echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
        echo "$tag -> $line" >&2
    else
        echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
        echo "$tag -> FAILED (see spec_gate_r5.log)" >&2
    fi
}

# --- headline shape B=32 ---
run nospec_b32 VOT_BENCH_SPEC=0
for K in 2 3 4 6; do
    run "spec_b32_k${K}_p07" VOT_BENCH_SPEC=oracle VOT_BENCH_ACCEPT=0.7 VOT_BENCH_SPEC_K=$K
done
for K in 2 3 4 6; do
    run "spec_b32_k${K}_p09" VOT_BENCH_SPEC=oracle VOT_BENCH_ACCEPT=0.9 VOT_BENCH_SPEC_K=$K
done

# --- small batch (spec-ratio-optimal) B=8 ---
run nospec_b8 VOT_BENCH_SPEC=0 VOT_BENCH_BATCH=8
for K in 2 3 4 6; do
    run "spec_b8_k${K}_p07" VOT_BENCH_SPEC=oracle VOT_BENCH_ACCEPT=0.7 VOT_BENCH_SPEC_K=$K VOT_BENCH_BATCH=8
done
for K in 2 3 4 6; do
    run "spec_b8_k${K}_p09" VOT_BENCH_SPEC=oracle VOT_BENCH_ACCEPT=0.9 VOT_BENCH_SPEC_K=$K VOT_BENCH_BATCH=8
done
echo "DONE $(date +%H:%M:%S)" >&2
