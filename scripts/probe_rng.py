import sys; sys.path.insert(0, "/root/repo")
import time; t0=time.time()
def t(m): print(f'{time.time()-t0:6.1f}s {m}', flush=True)
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import numpy as np, jax.numpy as jnp, dataclasses
import bench
cfg, graphs, labels, batch, real_edges = bench.build_workload()
from eagcn_tpu.models import init_eagcn, apply_eagcn
from eagcn_tpu.train.losses import weighted_bce_loss
params, state = init_eagcn(jax.random.key(0), cfg.model)
cw = jnp.ones((12,2))
import time as _t
def timeit(fn, *args):
    for _ in range(3): out = fn(*args)
    jax.block_until_ready(out)
    tt=_t.perf_counter()
    for _ in range(20): out = fn(*args)
    jax.block_until_ready(out)
    return (_t.perf_counter()-tt)/20

def grad_fn(drop):
    c2 = dataclasses.replace(cfg.model, dropout=drop)
    def loss_fn(p, s, b, key):
        logits, _, _, ns = apply_eagcn(p, s, b, c2, train=True, rng=key)
        return weighted_bce_loss(logits, b.labels, b.mol_mask, cw)
    return jax.jit(jax.grad(loss_fn))

for name, drop, impl in [('drop0.3-threefry', 0.3, 'threefry2x32'),
                         ('drop0.3-rbg', 0.3, 'rbg'),
                         ('drop0.0', 0.0, 'threefry2x32')]:
    key = jax.random.key(0, impl=impl)
    g = grad_fn(drop)
    tc0 = time.time()
    out = g(params, state, batch, key); jax.block_until_ready(out)
    t(f'{name}: compiled in {time.time()-tc0:.0f}s')
    dt = timeit(g, params, state, batch, key)
    t(f'{name}: {dt*1e3:.2f} ms -> {real_edges/dt/1e6:.2f}M edges/s')
