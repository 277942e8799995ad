#!/bin/bash
# Serialized TPU work: perf probe -> bench -> benchmark trainings.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== grad probe $(date) ==="
python -u -c "
import time; t0=time.time()
def t(m): print(f'{time.time()-t0:6.1f}s {m}', flush=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import numpy as np, jax.numpy as jnp
import bench
cfg, graphs, labels, batch, real_edges = bench.build_workload()
from eagcn_tpu.models import init_eagcn, apply_eagcn
from eagcn_tpu.train.losses import weighted_bce_loss
params, state = init_eagcn(jax.random.key(0), cfg.model)
cw = jnp.ones((12,2))
def loss_fn(p, s, b):
    logits, _, _, ns = apply_eagcn(p, s, b, cfg.model, train=True, rng=jax.random.key(0))
    return weighted_bce_loss(logits, b.labels, b.mol_mask, cw)
g = jax.jit(jax.grad(loss_fn))
gr = g(params, state, batch); jax.block_until_ready(gr)
t('grad compiled')
import time as _t
for _ in range(3): gr = g(params, state, batch)
jax.block_until_ready(gr)
tt=_t.perf_counter()
for _ in range(20): gr = g(params, state, batch)
jax.block_until_ready(gr)
dt=(_t.perf_counter()-tt)/20
t(f'SCATTER-FREE grad {dt*1e3:.2f} ms -> {real_edges/dt/1e6:.2f}M edges/s')
"

echo "=== bench.py $(date) ==="
python bench.py

train_one() {
  local name=$1 dsn=$2 every=$3
  echo "=== train $name $(date) ==="
  python -u -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import json
from eagcn_tpu.utils import benchmark_config
from eagcn_tpu.train import Experiment
cfg = benchmark_config('$dsn')
cfg.out_dir = '/root/repo/runs'
cfg.train.eval_every_epochs = $every
exp = Experiment(cfg, run_name='$name')
res = exp.run(resume=False)
print('FINAL_JSON $name', json.dumps(res, default=float))
"
}

train_one tox21_tpu_rs0 tox21 1
train_one lipo_tpu_rs0 lipo 5
train_one hiv_tpu_rs0 hiv 1
echo "=== queue done $(date) ==="
