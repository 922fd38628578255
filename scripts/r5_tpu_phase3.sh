#!/bin/bash
# Round-5 TPU phase 3: non-oracle engine points from the DISTILLED
# trained pair (VERDICT r4 item 2) + a same-session original-draft
# point for the acceptance-vs-tok/s curve.
set -u
OUT=${OUT:-/root/repo/scripts/r5_phase3.jsonl}
cd /root/repo

run_pair() {
    local tag=$1; shift
    echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
    local line
    line=$(env VOT_PAIR_DIR=/tmp/vot_wide_pair "$@" timeout 2400 \
        python scripts/tpu_trained_pair.py 2>>/root/repo/scripts/r5_phase3.log | tail -1)
    if [ -n "$line" ]; then
        echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$OUT"
        echo "$tag -> $line" >&2
    else
        echo "{\"tag\": \"$tag\", \"result\": null}" >> "$OUT"
        echo "$tag -> FAILED" >&2
    fi
}

run_pair distilled_k2 VOT_PAIR_DRAFT=draft_distilled VOT_PAIR_K=2
run_pair distilled_k4 VOT_PAIR_DRAFT=draft_distilled VOT_PAIR_K=4
run_pair orig_k4 VOT_PAIR_K=4
echo "PHASE3 DONE $(date +%H:%M:%S)" >&2
