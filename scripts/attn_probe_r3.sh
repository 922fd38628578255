#!/bin/bash
# Round-3 attention launch-cost decomposition (VERDICT item 3).
# The round-2 ctx probe showed ~180us/layer "fixed" at varying ctx; this
# sweeps B at fixed ctx to split per-CALL fixed cost from PER-SEQUENCE
# cost (DMA issues, per-seq dots), and sweeps seqs_per_program to price
# the per-grid-program prologue.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  echo "=== $* ==="
  env "$@" timeout 1800 python benchmarks/micro_attn.py
}

# per-seq vs per-call: B sweep at short and serving ctx (block 128)
run BS=128 CHUNK=1 CTX=128 T=5 B=2,4,8,16,32 DTYPE=fp8
run BS=128 CHUNK=1 CTX=512 T=5 B=2,4,8,16,32 DTYPE=fp8
run BS=128 CHUNK=1 CTX=512 T=5 B=2,4,8,16,32 DTYPE=bfloat16

# per-grid-program prologue: same work, different program counts
# (fp8 scratch is half bf16's, so BQ up to 32 fits VMEM at slots=2)
run BS=128 CHUNK=1 CTX=512 T=5 B=32 DTYPE=fp8 SLOTS=2 SPP=8
run BS=128 CHUNK=1 CTX=512 T=5 B=32 DTYPE=fp8 SLOTS=2 SPP=16
run BS=128 CHUNK=1 CTX=512 T=5 B=32 DTYPE=fp8 SLOTS=2 SPP=32
echo "ATTN PROBE DONE"
