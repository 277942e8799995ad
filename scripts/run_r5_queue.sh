#!/bin/bash
# Round-5 serialized TPU queue: guarded bench -> HIV discrimination runs
# -> giant-graph stress + memory envelope.  One chip; never idle.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
export EAGCN_DATA=/root/reference/Data

echo "=== bench.py (guarded) $(date) ==="
timeout 4000 python bench.py 2> /root/repo/runs/bench_r5.log \
    | tee /root/repo/runs/bench_r5.json

echo "=== HIV queue $(date) ==="
timeout 16000 python -u scripts/run_r5_hiv.py 2>&1 \
    | tee /root/repo/runs/r5_hiv_queue.log | grep -E "FINAL|===|epoch (1|.*0) "

echo "=== scaling tpu $(date) ==="
timeout 6000 python -u scripts/run_scaling.py tpu 2>&1 \
    | tee /root/repo/runs/r5_scaling_tpu.log | tail -40

echo "=== queue done $(date) ==="
