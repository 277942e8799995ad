"""Round-2 probe #2: true DEVICE time per op via in-program lax.scan loops
(the tunneled platform has a ~2 ms per-dispatch floor that pollutes
single-op timings)."""
import sys, time
sys.path.insert(0, "/root/repo")
t0 = time.time()
def t(m): print(f"{time.time()-t0:6.1f}s {m}", flush=True)

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
import jax.numpy as jnp

import bench
from eagcn_tpu.ops.aggregate import EllOps, edge_scores, ell_multi_aggregate_sym
from eagcn_tpu.models.norm import batch_norm_apply, init_batch_norm
from eagcn_tpu.models.layers import (dropout, init_multiview_layer,
                                     multiview_layer_apply)

cfg, graphs, labels, batch, real_edges = bench.build_workload()
t(f"workload built: {batch.node_feat.shape[0]} nodes")
key = jax.random.key(0)
N, D = batch.neigh.shape
F = 400

ops = EllOps(batch.neigh, batch.neigh_rel, batch.neigh_mask,
             neigh_rev=batch.neigh_rev)
x0 = jax.random.normal(jax.random.key(1), (N, F), jnp.float32)
w5 = jax.random.uniform(jax.random.key(2), (N, D, 5), jnp.float32)

K = 32  # in-program repetitions

def devtime(make_body, init, n=8):
    """make_body(carry) -> carry; scans K times inside one jit program."""
    @jax.jit
    def prog(c):
        return jax.lax.scan(lambda cc, _: (make_body(cc), None), c,
                            None, length=K)[0]
    c = prog(init)
    jax.block_until_ready(c)
    tt = time.perf_counter()
    for _ in range(n):
        c = prog(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - tt) / (n * K)


# 1) agg fwd device time
dt = devtime(lambda xx: ell_multi_aggregate_sym(
    w5, xx, batch.neigh, batch.neigh_rev, batch.neigh_mask)[:, 0, :F] + xx * 1e-9,
    x0)
t(f"agg fwd: {dt*1e3:.4f} ms/iter")

# 2) agg grad device time (custom vjp, wrt both)
def agg_g(xx):
    dw, dx = jax.grad(lambda w, y: ell_multi_aggregate_sym(
        w, y, batch.neigh, batch.neigh_rev, batch.neigh_mask).sum(),
        argnums=(0, 1))(w5, xx)
    return xx + dx * 1e-9
dt = devtime(agg_g, x0)
t(f"agg grad: {dt*1e3:.4f} ms/iter")

# 3) one multiview layer grad (train mode)
lp, ls = init_multiview_layer(jax.random.key(4), 22, F, (140,) * 5, "Concate")
def layer_g(carry):
    xx, k = carry
    k, sub = jax.random.split(k)
    def loss(p, y):
        h, _, _ = multiview_layer_apply(p, ls, ops, batch, y, "Concate",
                                        0.3, True, sub)
        return h.sum()
    dp, dx = jax.grad(loss, argnums=(0, 1))(lp, xx)
    return (xx + dx * 1e-9, k)
dt = devtime(layer_g, (x0, key))
t(f"1 multiview layer grad (train): {dt*1e3:.4f} ms/iter")

# 3b) eval-mode layer grad
def layer_ge(carry):
    xx = carry
    def loss(p, y):
        h, _, _ = multiview_layer_apply(p, ls, ops, batch, y, "Concate",
                                        0.3, False, None)
        return h.sum()
    dp, dx = jax.grad(loss, argnums=(0, 1))(lp, xx)
    return xx + dx * 1e-9
dt = devtime(layer_ge, x0)
t(f"1 multiview layer grad (eval-mode): {dt*1e3:.4f} ms/iter")

# 3c) layer FORWARD only (train mode)
def layer_f(carry):
    xx, k = carry
    k, sub = jax.random.split(k)
    h, _, _ = multiview_layer_apply(lp, ls, ops, batch, xx, "Concate",
                                    0.3, True, sub)
    return (xx + h[:, :F] * 1e-9, k)
dt = devtime(layer_f, (x0, key))
t(f"1 multiview layer fwd (train): {dt*1e3:.4f} ms/iter")

# 4) full model grad
from eagcn_tpu.models import init_eagcn, apply_eagcn
from eagcn_tpu.train.losses import weighted_bce_loss
params, state = init_eagcn(jax.random.key(0), cfg.model)
cw = jnp.ones((12, 2))
def full_g(carry):
    p, k = carry
    k, sub = jax.random.split(k)
    def loss(pp):
        logits, _, _, ns = apply_eagcn(pp, state, batch, cfg.model,
                                       train=True, rng=sub)
        return weighted_bce_loss(logits, batch.labels, batch.mol_mask, cw)
    g = jax.grad(loss)(p)
    return (jax.tree.map(lambda a, b: a + 1e-12 * b, p, g), k)
dt = devtime(full_g, (params, key), n=4)
t(f"full model grad: {dt*1e3:.4f} ms/iter")

# 5) full model FORWARD train-mode
def full_f(carry):
    p, k = carry
    k, sub = jax.random.split(k)
    logits, _, _, ns = apply_eagcn(p, state, batch, cfg.model,
                                   train=True, rng=sub)
    return (jax.tree.map(lambda a: a, p), k) if False else (
        jax.tree.map(lambda a: a + 0.0 * logits.sum(), p), k)
dt = devtime(full_f, (params, key), n=4)
t(f"full model fwd (train): {dt*1e3:.4f} ms/iter")

# 6) dense baseline grad device-time for comparison
adj, afm, rels, y = bench.build_dense_batch(graphs, labels)
dparams = bench.init_dense_params(jax.random.key(0), cfg)
def dense_g(carry):
    p = carry
    def loss(pp):
        out = bench.dense_forward(pp, adj, afm, rels)
        return jnp.mean((out - y) ** 2)
    g = jax.grad(loss)(p)
    return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)
dt = devtime(dense_g, dparams, n=4)
t(f"dense baseline grad: {dt*1e3:.4f} ms/iter")
