"""Pallas TPU kernel: fused multi-view ELLPACK SpMM.

Computes  out[n, v, f] = sum_d w[n, d, v] * x[neigh[n, d], f]  — the
five-view neighborhood aggregation of the EAGCN layer — in one kernel:
node features are gathered ONCE per row block and reused by all V views
(the XLA path materializes the same [N, D, F] gather; the kernel keeps it
in VMEM and fuses the weighted reduction).

Blocking: grid = (feature_tiles, row_blocks); the full [N, TF] feature tile
stays resident in VMEM across the row-block sweep (Pallas skips the DMA
when a block index repeats), row blocks stream through.  The weighted
reduction unrolls over the tiny degree (D<=8) and view (V=5) axes on the
VPU — no scatter, no MXU misuse on degenerate shapes.

Written per /opt/skills/guides/pallas_guide.md; numerically identical to
`EllOps.multi_aggregate` (asserted in tests, interpret mode on CPU)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, neigh_ref, w_ref, out_ref):
    # x_ref:    [N, TF]      feature tile (resident across row blocks)
    # neigh_ref:[BN, D]      neighbour indices for this row block
    # w_ref:    [BN, D, V]   per-view weights
    # out_ref:  [BN, V, TF]
    bn, d = neigh_ref.shape
    v = w_ref.shape[2]
    idx = neigh_ref[...].reshape(-1)                 # [BN*D]
    gathered = x_ref[idx]                             # [BN*D, TF] gather
    tf = x_ref.shape[1]
    gathered = gathered.reshape(bn, d, tf)
    w = w_ref[...]
    acc = jnp.zeros((bn, v, tf), dtype=jnp.float32)
    for dd in range(d):                               # D, V are tiny: unroll
        g_d = gathered[:, dd, :]                      # [BN, TF]
        for vv in range(v):
            acc = acc.at[:, vv, :].add(w[:, dd, vv, None] * g_d)
    out_ref[...] = acc


@functools.partial(
    jax.jit, static_argnames=("block_rows", "feature_tile", "interpret")
)
def ell_multi_spmm(
    x: jnp.ndarray,        # [N, F] float32
    neigh: jnp.ndarray,    # [N, D] int32
    weights: jnp.ndarray,  # [N, D, V] float32 (masked slots are 0)
    block_rows: int = 512,
    feature_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:          # [N, V, F]
    n0, f0 = x.shape
    _, d = neigh.shape
    v = weights.shape[2]
    # pad rows/features to tile multiples (XLA pads/slices for free)
    bn = min(block_rows, max(8, n0))
    n = -(-n0 // bn) * bn
    tf = min(feature_tile, max(128, f0))
    f = -(-f0 // tf) * tf
    if n != n0 or f != f0:
        x = jnp.pad(x, ((0, n - n0), (0, f - f0)))
    if n != n0:
        neigh = jnp.pad(neigh, ((0, n - n0), (0, 0)))
        weights = jnp.pad(weights, ((0, n - n0), (0, 0), (0, 0)))
    grid = (f // tf, n // bn)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, tf), lambda fi, ni: (0, fi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda fi, ni: (ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d, v), lambda fi, ni: (ni, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, v, tf), lambda fi, ni: (ni, 0, fi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, v, f), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v * f,
            bytes_accessed=4 * (n * f * (f // tf) + n * d * (1 + v) + n * v * f),
            transcendentals=0,
        ),
    )(x, neigh, weights)[:n0, :, :f0]


class PallasEllOps:
    """GraphOps adapter backed by the fused kernel.  Scoring and row sums
    stay in XLA (tiny elementwise work it fuses anyway); the gather-heavy
    aggregation runs in Pallas."""

    def __init__(self, neigh, neigh_rel, neigh_mask, interpret=None):
        self.neigh = neigh
        self.neigh_rel = neigh_rel
        self.neigh_mask = neigh_mask
        if interpret is None:
            # interpret automatically off-TPU (CPU tests / debugging)
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def scores(self, att_w: jnp.ndarray, rel_col: int) -> jnp.ndarray:
        from .aggregate import edge_scores

        rel = self.neigh_rel[:, :, rel_col]
        return edge_scores(att_w, rel, self.neigh_mask)

    def rowsum(self, weights: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(weights, axis=1)

    def aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        out = ell_multi_spmm(
            x, self.neigh, weights[:, :, None], interpret=self.interpret
        )
        return out[:, 0, :]

    def multi_aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        return ell_multi_spmm(x, self.neigh, weights, interpret=self.interpret)
