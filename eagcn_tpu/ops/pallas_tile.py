"""Fused multi-view edge-attention SpMM — Pallas TPU kernel.

One kernel computes, per [S, S] graph tile, everything the EAGCN layer
needs from the relation tensors (`eagcn_pytorch/layers.py:82-92`
semantics):

    sig_v[i,j]  = sigmoid(att_v[rel_v[i,j]]) * adj[i,j]      (5 views)
    agg_v[i,:]  = sum_j sig_v[i,j] * x[j,:]                  (MXU matmul)
    rows_v[i]   = sum_j sig_v[i,j]                           (row-norm denom)

The XLA tile backend materializes the five [T,S,S] fp32 score tensors in
HBM every layer (written forward, re-read backward — ~0.5 GB of traffic
per layer at bench scale).  This kernel keeps the scores in VMEM: HBM
reads are the int8 relation tiles (`tile_rel [T,5,S,S]`, 5 bytes/cell vs
20) and the feature tile; writes are the aggregated output only.  The
backward (custom VJP) recomputes the scores from the same int8 inputs —
flash-attention-style rematerialization — and is two more MXU matmuls per
view plus a compare-select reduction for the attention-dictionary grads.

Grid: (T, F/TF); the feature axis is innermost so the per-tile scores are
computed once (fi == 0) and stay resident in VMEM scratch across feature
tiles.  All matmuls accumulate fp32 via `preferred_element_type`.

Written per /opt/skills/guides/pallas_guide.md; numerically identical to
`TileOps.scores`/`multi_aggregate` (tests/test_pallas.py, interpret mode
on CPU, real kernel on TPU via bench.py --backend pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .aggregate import TileOps

V = 5


def _pick_ftile(f: int, s: int) -> int:
    """Feature-tile width: lane-aligned, minimal padding, VMEM-bounded
    (S=256 tiles halve the cap to keep fwd+bwd under the ~16MB budget)."""
    cap = 512 if s <= 128 else 256
    best, waste = 128, None
    for tf in (128, 256, 384, 512):
        if tf > cap:
            continue
        w = -(-f // tf) * tf - f
        if waste is None or w < waste or (w == waste and tf > best):
            best, waste = tf, w
    return best


def _scores_into(sig_ref, att_ref, adj_ref, rel_ref, n_rels):
    """Recompute the five masked score maps into VMEM scratch.  The
    attention dictionary is tiny (C <= n_bfeat), so the embedding lookup
    unrolls into compare-selects on the VPU."""
    sigw = jax.nn.sigmoid(att_ref[...])                  # [V, C]
    adj = adj_ref[0].astype(jnp.float32)                 # [S, S]
    for v in range(V):
        relv = rel_ref[0, v]                             # [S, S] i8
        acc = jnp.zeros(adj.shape, jnp.float32)
        for c in range(n_rels[v]):
            acc = jnp.where(relv == c, sigw[v, c], acc)
        sig_ref[v] = acc * adj
    return sigw


def _fwd_kernel(att_ref, x_ref, adj_ref, rel_ref, agg_ref, rows_ref,
                sig_ref, *, n_rels):
    fi = pl.program_id(1)

    @pl.when(fi == 0)
    def _():
        _scores_into(sig_ref, att_ref, adj_ref, rel_ref, n_rels)
        for v in range(V):
            rows_ref[v] = jnp.sum(sig_ref[v], axis=1)

    x = x_ref[...]
    for v in range(V):
        agg_ref[v] = jnp.dot(sig_ref[v], x,
                             preferred_element_type=jnp.float32)


def _bwd_kernel(att_ref, adj_ref, rel_ref, x_ref, g_agg_ref, g_rows_ref,
                datt_ref, dx_ref, sig_ref, dsig_ref, *, n_rels):
    t = pl.program_id(0)
    fi = pl.program_id(1)
    nfi = pl.num_programs(1)

    @pl.when(jnp.logical_and(t == 0, fi == 0))
    def _():
        datt_ref[...] = jnp.zeros_like(datt_ref)

    @pl.when(fi == 0)
    def _():
        _scores_into(sig_ref, att_ref, adj_ref, rel_ref, n_rels)
        # d rowsum[v,i] / d sig[v,i,j] = 1  -> broadcast over columns
        for v in range(V):
            dsig_ref[v] = jnp.broadcast_to(
                g_rows_ref[v][:, None], dsig_ref[v].shape
            )

    x = x_ref[...]                                        # [S, TF]
    dx = jnp.zeros(x.shape, jnp.float32)
    for v in range(V):
        gv = g_agg_ref[v]                                 # [S, TF]
        # dx[j,f] += sum_i sig[v,i,j] * g[v,i,f]   (contract row axis)
        dx = dx + jax.lax.dot_general(
            sig_ref[v], gv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dsig[v,i,j] += sum_f g[v,i,f] * x[j,f]   (contract feature axis)
        dsig_ref[v] += jax.lax.dot_general(
            gv, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[...] = dx

    @pl.when(fi == nfi - 1)
    def _():
        sigw = jax.nn.sigmoid(att_ref[...])
        adj = adj_ref[0].astype(jnp.float32)
        for v in range(V):
            d = dsig_ref[v] * adj                        # mask non-edges
            relv = rel_ref[0, v]
            for c in range(n_rels[v]):
                grad_c = sigw[v, c] * (1.0 - sigw[v, c]) * jnp.sum(
                    jnp.where(relv == c, d, 0.0)
                )
                datt_ref[v, c] += grad_c


@functools.lru_cache(maxsize=None)
def _make_fused(n_rels: tuple, s: int, tf: int, t: int, f: int, c_max: int,
                interpret: bool):
    """Builds the custom-VJP fused op for one static tile geometry."""
    grid = (t, f // tf)
    att_spec = pl.BlockSpec((V, c_max), lambda ti, fi: (0, 0),
                            memory_space=pltpu.VMEM)
    adj_spec = pl.BlockSpec((1, s, s), lambda ti, fi: (ti, 0, 0),
                            memory_space=pltpu.VMEM)
    rel_spec = pl.BlockSpec((1, V, s, s), lambda ti, fi: (ti, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((s, tf), lambda ti, fi: (ti, fi),
                          memory_space=pltpu.VMEM)
    vagg_spec = pl.BlockSpec((V, s, tf), lambda ti, fi: (0, ti, fi),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((V, s), lambda ti, fi: (0, ti),
                             memory_space=pltpu.VMEM)
    n = t * s

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, n_rels=n_rels),
        grid=grid,
        in_specs=[att_spec, x_spec, adj_spec, rel_spec],
        out_specs=(vagg_spec, rows_spec),
        out_shape=(
            jax.ShapeDtypeStruct((V, n, f), jnp.float32),
            jax.ShapeDtypeStruct((V, n), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((V, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * V * n * s * f,
            bytes_accessed=(6 * n * s) + 4 * (n * f * (1 + V)),
            transcendentals=V * c_max,
        ),
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, n_rels=n_rels),
        grid=grid,
        in_specs=[att_spec, adj_spec, rel_spec, x_spec, vagg_spec,
                  rows_spec],
        out_specs=(
            pl.BlockSpec((V, c_max), lambda ti, fi: (0, 0),
                         memory_space=pltpu.VMEM),
            x_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((V, c_max), jnp.float32),
            jax.ShapeDtypeStruct((n, f), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((V, s, s), jnp.float32),
            pltpu.VMEM((V, s, s), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * V * n * s * f,
            bytes_accessed=(6 * n * s) + 4 * (2 * n * f * (1 + V)),
            transcendentals=V * c_max,
        ),
    )

    @jax.custom_vjp
    def fused(att, x, adj, rel):
        return fwd_call(att, x, adj, rel)

    def fused_fwd(att, x, adj, rel):
        return fwd_call(att, x, adj, rel), (att, x, adj, rel)

    def fused_bwd(res, g):
        att, x, adj, rel = res
        g_agg, g_rows = g
        datt, dx = bwd_call(att, adj, rel, x, g_agg, g_rows)
        return datt, dx, None, None

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_tile_multiview(att, x, tile_adj, tile_rel, n_rels,
                         interpret=False):
    """att [V, C_max] f32 (rows zero-padded past n_rels[v]); x [N, F] f32;
    tile_adj [T, S, S] i8; tile_rel [T, V, S, S] i8.
    Returns (agg [V, N, F] f32, rowsum [V, N] f32)."""
    t, s = tile_adj.shape[0], tile_adj.shape[1]
    n0, f0 = x.shape
    assert n0 == t * s, (n0, t, s)
    tf = _pick_ftile(f0, s)
    f = -(-f0 // tf) * tf
    if f != f0:
        x = jnp.pad(x, ((0, 0), (0, f - f0)))
    fn = _make_fused(tuple(n_rels), s, tf, t, f, att.shape[1],
                     bool(interpret))
    agg, rows = fn(att.astype(jnp.float32), x.astype(jnp.float32),
                   tile_adj, tile_rel)
    if f != f0:
        agg = agg[:, :, :f0]
    return agg, rows


class PallasTileOps(TileOps):
    """Tile backend with the fused Pallas kernel on the multi-view hot
    path.  Single-view `aggregate`/`scores`/`rowsum` (consensus, GCN,
    DiffPool) fall back to the XLA tile path — they run once per model,
    not 20 times per step."""

    def __init__(self, tile_adj, tile_rel, num_nodes: int,
                 compute_dtype=None, interpret=None):
        super().__init__(tile_adj, tile_rel, num_nodes,
                         compute_dtype=compute_dtype)
        self.tile_adj_i8 = tile_adj
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def fused_multiview(self, att_list, x):
        """att_list: five [n_rels[v]] score dictionaries.  Returns
        (agg [V, N, F] fp32, rowsum [V, N] fp32)."""
        n_rels = tuple(int(a.shape[0]) for a in att_list)
        c_max = -(-max(n_rels) // 8) * 8     # sublane-align the dict table
        att = jnp.zeros((V, c_max), jnp.float32)
        for v, a in enumerate(att_list):
            att = att.at[v, : n_rels[v]].set(a.astype(jnp.float32))
        xt = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
        return fused_tile_multiview(
            att, xt, self.tile_adj_i8, self.tile_rel, n_rels,
            interpret=self.interpret,
        )
