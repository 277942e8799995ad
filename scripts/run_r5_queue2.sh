#!/bin/bash
# Round-5 revised TPU queue tail: runs AFTER hiv_bnpad_rs0_r5 completes.
# Order secures the giant-stress artifact (VERDICT #6) before the long
# seed runs: scaling tpu (~45 min) -> HIV rs=1 -> HIV rs=2 (if time).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export EAGCN_DATA=/root/reference/Data

echo "=== scaling tpu $(date) ==="
timeout 6000 python -u scripts/run_scaling.py tpu 2>&1 \
    | tee /root/repo/runs/r5_scaling_tpu.log | tail -40

echo "=== HIV rs=1 $(date) ==="
timeout 12000 python -u scripts/run_r5_hiv.py hiv_concat_rs1_r5 2>&1 \
    | tee -a /root/repo/runs/r5_hiv_queue.log | grep -E "FINAL|==="

echo "=== HIV rs=2 $(date) ==="
timeout 12000 python -u scripts/run_r5_hiv.py hiv_concat_rs2_r5 2>&1 \
    | tee -a /root/repo/runs/r5_hiv_queue.log | grep -E "FINAL|==="

echo "=== queue2 done $(date) ==="
