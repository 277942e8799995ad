"""Round-2 probe: isolate WHICH op's backward is pathologically slow on TPU.

Eval forward of the full model is 0.15 ms; the full grad was ~38 ms in
round 1.  Each probe here compiles a small separate program so we can
attribute the cost.  Run: python scripts/probe_bwd.py
"""
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
from eagcn_tpu.ops.aggregate import (EllOps, edge_scores,
                                     ell_multi_aggregate_sym)
from eagcn_tpu.models.norm import batch_norm_apply, init_batch_norm
from eagcn_tpu.models.layers import dropout

cfg, graphs, labels, batch, real_edges = bench.build_workload()
t(f"workload built: {batch.node_feat.shape[0]} nodes")
key = jax.random.key(0)
N, D = batch.neigh.shape
F = 400  # layer-2 width (sum of sgc1 = 80*5)

ops = EllOps(batch.neigh, batch.neigh_rel, batch.neigh_mask,
             neigh_rev=batch.neigh_rev)
x = jax.random.normal(jax.random.key(1), (N, F), jnp.float32)
w5 = jax.random.uniform(jax.random.key(2), (N, D, 5), jnp.float32)


def timeit(fn, *args, n=20):
    out = fn(*args)
    for _ in range(2):
        out = fn(*args)
    jax.block_until_ready(out)
    tt = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - tt) / n


# --- 1) multi_aggregate fwd only
f_agg = jax.jit(lambda w, xx: ell_multi_aggregate_sym(
    w, xx, batch.neigh, batch.neigh_rev, batch.neigh_mask).sum())
t(f"agg fwd: {timeit(f_agg, w5, x)*1e3:.3f} ms")

# --- 2) multi_aggregate grad (custom VJP) wrt both
g_agg = jax.jit(jax.grad(lambda w, xx: ell_multi_aggregate_sym(
    w, xx, batch.neigh, batch.neigh_rev, batch.neigh_mask).sum(),
    argnums=(0, 1)))
t(f"agg grad(custom vjp): {timeit(g_agg, w5, x)*1e3:.3f} ms")

# --- 3) edge_scores grad (one-hot contraction), 5 views x 4 layers = 20x
att_ws = [jax.random.normal(jax.random.key(10 + i), (22,)) for i in range(20)]
def scores_loss(ws):
    s = 0.0
    for w in ws:
        s = s + jnp.sum(edge_scores(w, batch.neigh_rel[:, :, 0],
                                    batch.neigh_mask))
    return s
g_sc = jax.jit(jax.grad(scores_loss))
t(f"20x edge_scores grad: {timeit(g_sc, att_ws)*1e3:.3f} ms")

# --- 4) masked BN grad, train mode
bn_p, bn_s = init_batch_norm(jax.random.key(3), F)
def bn_loss(p, xx):
    h, _ = batch_norm_apply(p, bn_s, xx, batch.node_mask, True, None)
    return h.sum()
g_bn = jax.jit(jax.grad(bn_loss, argnums=(0, 1)))
t(f"masked BN grad: {timeit(g_bn, bn_p, x)*1e3:.3f} ms")

# --- 5) dropout grad
def drop_loss(xx, k):
    return dropout(xx, 0.3, k, True).sum()
g_dr = jax.jit(jax.grad(drop_loss))
t(f"dropout grad: {timeit(g_dr, x, key)*1e3:.3f} ms")

# --- 6) 20x dropout grads (as in the real model: 5 views x 4 layers)
def drop20_loss(xx, k):
    ks = jax.random.split(k, 20)
    s = 0.0
    for i in range(20):
        s = s + dropout(xx, 0.3, ks[i], True).sum()
    return s
g_dr20 = jax.jit(jax.grad(drop20_loss))
t(f"20x dropout grad: {timeit(g_dr20, x, key)*1e3:.3f} ms")

# --- 7) full single multiview layer grad (layer 2 shape)
from eagcn_tpu.models.layers import init_multiview_layer, multiview_layer_apply
lp, ls = init_multiview_layer(jax.random.key(4), 22, F, (140,) * 5, "Concate")
def layer_loss(p, xx, k):
    h, _, _ = multiview_layer_apply(p, ls, ops, batch, xx, "Concate",
                                    0.3, True, k)
    return h.sum()
g_ly = jax.jit(jax.grad(layer_loss, argnums=(0, 1)))
t(f"1 multiview layer grad (train): {timeit(g_ly, lp, x, key)*1e3:.3f} ms")

# --- 7b) same without dropout/BN-train
def layer_loss_eval(p, xx):
    h, _, _ = multiview_layer_apply(p, ls, ops, batch, xx, "Concate",
                                    0.3, False, None)
    return h.sum()
g_lye = jax.jit(jax.grad(layer_loss_eval, argnums=(0, 1)))
t(f"1 multiview layer grad (eval-mode): {timeit(g_lye, lp, x)*1e3:.3f} ms")

# --- 8) segment readout grad
from eagcn_tpu.ops.aggregate import segment_readout
def ro_loss(xx):
    return segment_readout(xx, batch.node_mol, 256, batch.node_mask).sum()
g_ro = jax.jit(jax.grad(ro_loss))
t(f"segment_readout grad: {timeit(g_ro, x)*1e3:.3f} ms")

# --- 9) full model grad for reference
from eagcn_tpu.models import init_eagcn, apply_eagcn
from eagcn_tpu.train.losses import weighted_bce_loss
params, state = init_eagcn(jax.random.key(0), cfg.model)
cw = jnp.ones((12, 2))
def loss_fn(p, s, b, k):
    logits, _, _, ns = apply_eagcn(p, s, b, cfg.model, train=True, rng=k)
    return weighted_bce_loss(logits, b.labels, b.mol_mask, cw)
g_full = jax.jit(jax.grad(loss_fn))
t(f"full model grad: {timeit(g_full, params, state, batch, key)*1e3:.3f} ms")

# --- 10) full model grad, eval-mode (no dropout, BN running stats)
def loss_eval(p, s, b):
    logits, _, _, _ = apply_eagcn(p, s, b, cfg.model, train=False)
    return weighted_bce_loss(logits, b.labels, b.mol_mask, cw)
g_fe = jax.jit(jax.grad(loss_eval))
t(f"full model grad (eval-mode): {timeit(g_fe, params, state, batch)*1e3:.3f} ms")
