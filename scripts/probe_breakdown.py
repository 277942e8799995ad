import sys; sys.path.insert(0, "/root/repo")
import time
t0 = time.time()
def t(m): print(f"{time.time()-t0:6.1f}s {m}", flush=True)

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import dataclasses
import numpy as np
import jax.numpy as jnp
import bench
from eagcn_tpu.models import init_eagcn, apply_eagcn
from eagcn_tpu.train.losses import weighted_bce_loss

cfg, graphs, labels, batch, real_edges = bench.build_workload()
params, state = init_eagcn(jax.random.key(0), cfg.model)
cw = jnp.ones((12, 2))
key = jax.random.key(0)

def timeit(fn, *args, n=20):
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    tt = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - tt) / n

# 1) micro: the attention-dictionary scatter backward, 20 instances
rel = batch.neigh_rel[:, :, 0]
mask = batch.neigh_mask
att_ws = [jnp.asarray(np.random.default_rng(i).normal(0, 0.1, (22,)),
                      jnp.float32) for i in range(20)]
def micro_loss(ws):
    s = 0.0
    for w in ws:
        s = s + jnp.sum(jax.nn.sigmoid(w[rel]) * mask)
    return s
g_micro = jax.jit(jax.grad(micro_loss))
dt = timeit(g_micro, att_ws)
t(f"micro 20x att-scatter grad: {dt*1e3:.3f} ms")

# 2) train-mode forward (no grad)
fwd_train = jax.jit(lambda p, s, b, k: apply_eagcn(p, s, b, cfg.model,
                                                   train=True, rng=k)[0])
dt = timeit(fwd_train, params, state, batch, key)
t(f"train-mode forward: {dt*1e3:.3f} ms")

# 3) eval-mode forward
fwd_eval = jax.jit(lambda p, s, b: apply_eagcn(p, s, b, cfg.model,
                                               train=False)[0])
dt = timeit(fwd_eval, params, state, batch)
t(f"eval-mode forward: {dt*1e3:.3f} ms")

# 4) grad, full train mode
def loss_fn(p, s, b, k):
    logits, _, _, ns = apply_eagcn(p, s, b, cfg.model, train=True, rng=k)
    return weighted_bce_loss(logits, b.labels, b.mol_mask, cw)
g_full = jax.jit(jax.grad(loss_fn))
dt = timeit(g_full, params, state, batch, key)
t(f"full grad: {dt*1e3:.2f} ms")

# 5) grad wrt ONLY the dense head (graph layers constant): isolates
#    whether the cost is in the message-passing backward
def loss_head(dense_params, p, s, b, k):
    p2 = dict(p)
    p2.update(dense_params)
    logits, _, _, _ = apply_eagcn(p2, s, b, cfg.model, train=True, rng=k)
    return weighted_bce_loss(logits, b.labels, b.mol_mask, cw)
head = {k2: params[k2] for k2 in ("den1", "den2", "den3")}
g_head = jax.jit(jax.grad(loss_head))
dt = timeit(g_head, head, params, state, batch, key)
t(f"head-only grad: {dt*1e3:.2f} ms")

# 6) grad with BN eval-mode statistics (train=False but rng for dropout off)
def loss_eval(p, s, b):
    logits, _, _, _ = apply_eagcn(p, s, b, cfg.model, train=False)
    return weighted_bce_loss(logits, b.labels, b.mol_mask, cw)
g_eval = jax.jit(jax.grad(loss_eval))
dt = timeit(g_eval, params, state, batch)
t(f"eval-mode grad: {dt*1e3:.2f} ms")
