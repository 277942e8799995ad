#!/bin/bash
# Waits for the HIV training process, then runs the TPU perf/parity queue:
#   1. bf16 vs fp32 train-step probe (same workload as bench.py)
#   2. bench.py (headline JSON line)
#   3. tox21 Weighted_sum parity rerun
#   4. freesolv Weighted_sum parity rerun
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

wait_pid=${1:-}
if [ -n "$wait_pid" ]; then
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 30; done
fi

echo "=== bf16 probe $(date) ==="
python -u - <<'EOF'
import time
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import dataclasses
import numpy as np
import jax.numpy as jnp
import bench
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.train import make_optimizer, make_train_step

cfg, graphs, labels, batch, real_edges = bench.build_workload()
for tag, mcfg in (("fp32", cfg.model),
                  ("bf16", dataclasses.replace(cfg.model, bf16=True))):
    params, state = init_eagcn(jax.random.key(0), cfg.model)
    tx = make_optimizer(5e-4, 1e-4)
    opt_state = tx.init(params)
    cw = np.ones((cfg.model.n_tasks, 2), np.float32)
    step = make_train_step(mcfg, "class", tx, cw)
    rng = jax.random.key(1)
    def one(carry):
        p, s, o = carry
        p, s, o, loss = step(p, s, o, batch, rng)
        return (p, s, o)
    dt = bench.time_steps(one, (params, state, opt_state))
    print(f"{tag}: {dt*1e3:.3f} ms/step -> {real_edges/dt/1e6:.2f}M edges/s",
          flush=True)
EOF

echo "=== bench.py $(date) ==="
python bench.py

train_one() {
  local name=$1 dsn=$2 arch=$3 every=$4
  echo "=== train $name $(date) ==="
  python -u -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import json
from eagcn_tpu.utils import benchmark_config
from eagcn_tpu.train import Experiment
cfg = benchmark_config('$dsn', structure='$arch')
cfg.out_dir = '/root/repo/runs'
cfg.train.eval_every_epochs = $every
exp = Experiment(cfg, run_name='$name')
res = exp.run(resume=False)
print('FINAL_JSON $name', json.dumps(res, default=float))
"
}

train_one tox21_weighted_tpu_rs0 tox21 Weighted_sum 1
train_one freesolv_weighted_tpu_rs0 freesolv Weighted_sum 10
echo "=== queue done $(date) ==="
