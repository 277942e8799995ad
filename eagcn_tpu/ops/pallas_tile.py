"""Fused multi-view edge-attention SpMM — Pallas TPU kernel.

One kernel computes, per [S, S] graph tile, the multi-view aggregation the
EAGCN layer needs from the relation tensors (`eagcn_pytorch/layers.py:82-92`
semantics):

    sig_v[i,j]  = sigw_v[rel_v[i,j]] * adj[i,j]       (5 views, VMEM only)
    agg_v[i,:]  = sum_j sig_v[i,j] * x_v[j,:]         (MXU matmul)

where ``sigw_v = sigmoid(att_v)`` is computed OUTSIDE the kernel (a [V, C]
table — autodiff handles the sigmoid; the custom VJP returns d sigw).  The
score row-sums needed for row normalization are NOT computed here: they
equal ``counts_v @ sigw_v`` with a static per-node relation-count table
(see `TileOps.rel_rowsums`), an exact, tiny, differentiable XLA matmul.

Two variants share the kernel body:

* shared-x (``fused_multiview``): all views aggregate the same features
  [N, F] — used when f_in < f_out (layer 1).
* per-view-x (``fused_multiview_pv``): x is [V, N, F], one feature set per
  view — used by the "aggregate on the narrow side" rewrite
  ((A @ X) @ W == A @ (X @ W), row-norm is a per-node scalar so it
  commutes), which cuts aggregation FLOPs by f_in/f_out (3.5x at tox21
  widths).

Why a kernel at all: the XLA tile backend materializes the five [T,S,S]
score tensors (plus one-hot temps) in HBM every layer — the round-2 bench
OOM'd on exactly those temps.  Here scores live in VMEM scratch and are
recomputed in the backward from the int8 relation tiles
(flash-attention-style remat).  HBM traffic is the int8 tiles + features.

Mosaic/v5e notes (found by probing the real compiler):
* int8 vector compares are unsupported -> cast rel tiles to int32 first.
* scalar broadcast from a VMEM vector causes an "invalid relayout" -> the
  sigw table lives in SMEM and is read as scalars.
* the attention-dictionary gradient is accumulated into an SMEM [V, C]
  output across grid steps (sequential on TPU).

Written per /opt/skills/guides/pallas_guide.md; numerically identical to
`TileOps` (tests/test_pallas.py runs interpret mode on CPU; the compiled
kernel runs on TPU via bench.py and CLI training with --backend pallas).
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
    (per-view-x blocks are V x larger, so cap lower)."""
    cap = 256 if s <= 128 else 128
    best, waste = 128, None
    for tf in (128, 256):
        if tf > cap:
            continue
        w = -(-f // tf) * tf - f
        if waste is None or w < waste or (w == waste and tf > best):
            best, waste = tf, w
    return best


def _scores_into(sig_ref, sigw_ref, adj_ref, rel_ref, n_rels, tb):
    """Recompute the five masked score maps for a TB-block of tiles into
    VMEM scratch.  sigw is a tiny SMEM table; the per-relation select
    unrolls into VPU compare-multiply-adds (C <= n_bfeat passes over each
    [S, S] tile)."""
    for b in range(tb):
        adj = adj_ref[b].astype(jnp.float32)
        for v in range(V):
            relv = rel_ref[b, v].astype(jnp.int32)
            acc = jnp.zeros(adj.shape, jnp.float32)
            for c in range(n_rels[v]):
                acc = acc + (relv == c).astype(jnp.float32) * sigw_ref[v, c]
            sig_ref[b, v] = acc * adj


def _fwd_kernel(sigw_ref, x_ref, adj_ref, rel_ref, agg_ref, sig_ref, *,
                n_rels, shared, tb, s):
    fi = pl.program_id(1)

    @pl.when(fi == 0)
    def _():
        _scores_into(sig_ref, sigw_ref, adj_ref, rel_ref, n_rels, tb)

    for b in range(tb):
        rows = slice(b * s, (b + 1) * s)
        for v in range(V):
            x = x_ref[rows] if shared else x_ref[v, rows]
            sig = sig_ref[b, v].astype(x.dtype)
            out = jnp.dot(sig, x, preferred_element_type=jnp.float32)
            agg_ref[v, rows] = out.astype(agg_ref.dtype)


def _bwd_kernel(sigw_ref, adj_ref, rel_ref, x_ref, g_ref,
                dsigw_ref, dx_ref, sig_ref, dsig_ref, *, n_rels, shared,
                tb, s, f_rem):
    t = pl.program_id(0)
    fi = pl.program_id(1)
    nfi = pl.num_programs(1)

    @pl.when(jnp.logical_and(t == 0, fi == 0))
    def _():
        for v in range(V):
            for c in range(n_rels[v]):
                dsigw_ref[v, c] = 0.0

    @pl.when(fi == 0)
    def _():
        _scores_into(sig_ref, sigw_ref, adj_ref, rel_ref, n_rels, tb)
        dsig_ref[...] = jnp.zeros(dsig_ref.shape, dsig_ref.dtype)

    for b in range(tb):
        rows = slice(b * s, (b + 1) * s)
        dx_shared = None
        for v in range(V):
            x = x_ref[rows] if shared else x_ref[v, rows]
            gv = g_ref[v, rows]                           # [S, TF]
            if f_rem:
                # the feature dim is NOT padded in HBM: the final grid
                # block is partial and its out-of-bounds lanes load
                # unspecified data (NaN in interpret mode).  Stores are
                # masked automatically, but the dsig dot below CONTRACTS
                # the feature axis, so the tail lanes of BOTH operands
                # must be zeroed (0 * NaN = NaN — one side is not enough).
                lane = jax.lax.broadcasted_iota(jnp.int32, gv.shape, 1)
                ok = jnp.logical_or(fi != nfi - 1, lane < f_rem)
                gv = jnp.where(ok, gv, 0)
                x = jnp.where(ok, x, 0)
            sig = sig_ref[b, v].astype(gv.dtype)
            # dx[j,f] += sum_i sig[v,i,j] * g[v,i,f] (contract row axis)
            dxv = jax.lax.dot_general(
                sig, gv, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if shared:
                dx_shared = dxv if dx_shared is None else dx_shared + dxv
            else:
                dx_ref[v, rows] = dxv.astype(dx_ref.dtype)
            # dsig[v,i,j] += sum_f g[v,i,f] * x[j,f] (contract feature axis)
            dsig_ref[b, v] += jax.lax.dot_general(
                gv.astype(x.dtype), x, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if shared:
            dx_ref[rows] = dx_shared.astype(dx_ref.dtype)

    @pl.when(fi == nfi - 1)
    def _():
        for b in range(tb):
            adj = adj_ref[b].astype(jnp.float32)
            for v in range(V):
                d = dsig_ref[b, v] * adj                 # mask non-edges
                relv = rel_ref[b, v].astype(jnp.int32)
                for c in range(n_rels[v]):
                    grad_c = jnp.sum(
                        (relv == c).astype(jnp.float32) * d
                    )
                    dsigw_ref[v, c] += grad_c


def _pick_tb(t: int, s: int, tf: int, shared: bool, xbytes: int,
             n_scratch: int) -> int:
    """Tiles per grid step: the [S,S]@[S,TF] dots are individually too
    small to hide grid + DMA overhead (kernels profiled ~3x over their
    HBM-bound floor at TB=1); blocking TB tiles per step amortizes it.
    TB is capped by an explicit VMEM budget: double-buffered blocks
    (x, agg[, g, dx]) + f32 score scratches must fit ~12 MB of the
    v5e's ~16 MB VMEM."""
    budget = 12 * 2 ** 20
    for tb in (8, 4, 2, 1):
        if t % tb:
            continue
        x_block = tb * s * tf * xbytes * (1 if shared else V)
        agg_block = V * tb * s * tf * xbytes
        grads = 0 if n_scratch == 1 else (x_block + agg_block)
        blocks = 2 * (x_block + agg_block + grads
                      + tb * s * s * (1 + V))           # + adj/rel i8
        scratch = n_scratch * tb * V * s * s * 4
        if blocks + scratch <= budget:
            return tb
    return 1


@functools.lru_cache(maxsize=None)
def _make_fused(n_rels: tuple, s: int, tf: int, t: int, f: int, c_max: int,
                shared: bool, xdtype_name: str, interpret: bool):
    """Builds the custom-VJP fused op for one static geometry."""
    xdtype = jnp.dtype(xdtype_name)
    tb_f = _pick_tb(t, s, tf, shared, xdtype.itemsize, n_scratch=1)
    tb_b = _pick_tb(t, s, tf, shared, xdtype.itemsize, n_scratch=2)
    sigw_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    nf = -(-f // tf)          # feature grid; last block partial if f % tf
    f_rem = f % tf

    def specs(tb):
        adj = pl.BlockSpec((tb, s, s), lambda ti, fi: (ti, 0, 0),
                           memory_space=pltpu.VMEM)
        rel = pl.BlockSpec((tb, V, s, s), lambda ti, fi: (ti, 0, 0, 0),
                           memory_space=pltpu.VMEM)
        if shared:
            x = pl.BlockSpec((tb * s, tf), lambda ti, fi: (ti, fi),
                             memory_space=pltpu.VMEM)
        else:
            x = pl.BlockSpec((V, tb * s, tf), lambda ti, fi: (0, ti, fi),
                             memory_space=pltpu.VMEM)
        vagg = pl.BlockSpec((V, tb * s, tf), lambda ti, fi: (0, ti, fi),
                            memory_space=pltpu.VMEM)
        return adj, rel, x, vagg

    n = t * s
    flops_per_view = 2 * n * s * f
    x_bytes = (n * f * xdtype.itemsize) * (1 if shared else V)

    adj_f, rel_f, x_f, vagg_f = specs(tb_f)
    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, n_rels=n_rels, shared=shared,
                          tb=tb_f, s=s),
        grid=(t // tb_f, nf),
        in_specs=[sigw_spec, x_f, adj_f, rel_f],
        out_specs=vagg_f,
        # agg at compute width (fp32-accumulated in VMEM): halves the HBM
        # write + every downstream read in bf16 mode
        out_shape=jax.ShapeDtypeStruct((V, n, f), xdtype),
        scratch_shapes=[pltpu.VMEM((tb_f, V, s, s), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=V * flops_per_view,
            bytes_accessed=(6 * n * s) + x_bytes + 4 * V * n * f,
            transcendentals=0,
        ),
    )

    adj_b, rel_b, x_b, vagg_b = specs(tb_b)
    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, n_rels=n_rels, shared=shared,
                          tb=tb_b, s=s, f_rem=f_rem),
        grid=(t // tb_b, nf),
        in_specs=[sigw_spec, adj_b, rel_b, x_b, vagg_b],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            x_b,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((V, c_max), jnp.float32),
            jax.ShapeDtypeStruct(
                (n, f) if shared else (V, n, f), xdtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb_b, V, s, s), jnp.float32),
            pltpu.VMEM((tb_b, V, s, s), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * V * flops_per_view,
            bytes_accessed=(6 * n * s) + 2 * x_bytes + 4 * V * n * f,
            transcendentals=0,
        ),
    )

    @jax.custom_vjp
    def fused(sigw, x, adj, rel):
        return fwd_call(sigw, x, adj, rel)

    def fused_fwd(sigw, x, adj, rel):
        return fwd_call(sigw, x, adj, rel), (sigw, x, adj, rel)

    def fused_bwd(res, g):
        sigw, x, adj, rel = res
        # cotangent at compute width: keeps the two backward MXU dots at
        # bf16 rate (an f32 cotangent would silently drop them to fp32)
        dsigw, dx = bwd_call(sigw, adj, rel, x, g.astype(xdtype))
        return dsigw, dx, None, None

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_tile_multiview(sigw, x, tile_adj, tile_rel, n_rels,
                         interpret=False):
    """sigw [V, C_max] f32 (= sigmoid(att), rows zero-padded past
    n_rels[v]); x [N, F] (shared) or [V, N, F] (per-view); tile_adj
    [T, S, S] i8; tile_rel [T, V, S, S] i8.  Returns agg [V, N, F] f32."""
    t, s = tile_adj.shape[0], tile_adj.shape[1]
    shared = x.ndim == 2
    n0, f0 = (x.shape if shared else x.shape[1:])
    assert n0 == t * s, (n0, t, s)
    tf = _pick_ftile(f0, s)
    # f0 need not be lane-aligned: the feature grid's last block is
    # partial (masked stores; the bwd kernel zero-masks the tail lanes of
    # the cotangent before its feature-contracting dot).  Keeping the
    # [V, N, F] arrays unpadded in HBM saves the explicit pad round-trips
    # and up to 83% of the kernel's byte footprint at reference widths
    # (140 -> 256, 280 -> 384 padding previously).
    fn = _make_fused(tuple(n_rels), s, tf, t, f0, sigw.shape[1], shared,
                     x.dtype.name, bool(interpret))
    return fn(sigw.astype(jnp.float32), x, tile_adj, tile_rel)


def _pad_sigw(att_list):
    """Stack per-view sigmoid tables into one sublane-aligned [V, C] f32
    array (differentiable; padding rows get zero cotangents)."""
    n_rels = tuple(int(a.shape[0]) for a in att_list)
    c_max = -(-max(n_rels) // 8) * 8
    sigw = jnp.zeros((V, c_max), jnp.float32)
    for v, a in enumerate(att_list):
        sigw = sigw.at[v, : n_rels[v]].set(
            jax.nn.sigmoid(a.astype(jnp.float32)))
    return sigw, n_rels


class PallasTileOps(TileOps):
    """Tile backend with the fused Pallas kernel on the multi-view hot
    path.  Single-view `aggregate`/`scores`/`rowsum` (consensus, GCN,
    DiffPool) fall back to the XLA tile path — they run once per model,
    not 20 times per step."""

    def __init__(self, tile_adj, tile_rel, num_nodes: int,
                 compute_dtype=None, interpret=None,
                 neigh_rel=None, neigh_mask=None, n_rels=None):
        super().__init__(tile_adj, tile_rel, num_nodes,
                         compute_dtype=compute_dtype,
                         neigh_rel=neigh_rel, neigh_mask=neigh_mask,
                         n_rels=n_rels)
        self.tile_adj_i8 = tile_adj
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def _kernel_x(self, x):
        dt = self.compute_dtype
        return x.astype(dt) if dt is not None and x.dtype != dt else x

    def fused_multiview(self, att_list, x):
        """att_list: five [n_rels[v]] attention dictionaries; x [N, F]
        shared across views.  Returns (agg [V, N, F] f32, rows [V, N])."""
        sigw, n_rels = _pad_sigw(att_list)
        agg = fused_tile_multiview(
            sigw, self._kernel_x(x), self.tile_adj_i8, self.tile_rel,
            n_rels, interpret=self.interpret,
        )
        return agg, self.rel_rowsums(att_list)

    def fused_multiview_pv(self, att_list, ys):
        """Per-view features (the narrow-side rewrite): ys is a list of
        five [N, f_v] arrays; views are padded to max(f_v) for the stacked
        kernel and sliced back.  Returns (agg list of [N, f_v] f32,
        rows [V, N])."""
        sigw, n_rels = _pad_sigw(att_list)
        fs = [int(y.shape[1]) for y in ys]
        fmax = max(fs)
        ys = [self._kernel_x(y) for y in ys]
        xs = jnp.stack(
            [y if f == fmax else jnp.pad(y, ((0, 0), (0, fmax - f)))
             for y, f in zip(ys, fs)], axis=0)
        agg = fused_tile_multiview(
            sigw, xs, self.tile_adj_i8, self.tile_rel, n_rels,
            interpret=self.interpret,
        )
        return [agg[v, :, : fs[v]] for v in range(V)], \
            self.rel_rowsums(att_list)
