"""Giant-graph aggregation: chunked, flat-table, scatter-free.

Why a separate path (BASELINE config 5, the 10-100M-edge single-graph
stress): on TPU every array is tiled T(8,128) — the MINOR dimension is
padded to 128 lanes.  The molecule-scale ELL layout stores neighbour
tables as [N, D] with D=6..8, which costs 16x their logical bytes at
rest (a [25M, 8] int32 table would be 12.8 GB in HBM), and the backward
gathers materialize [N, D, f] temps that pad f -> 128 (measured: two
9.5 GB temps at 2.5M nodes for f=16 — the round-4 envelope OOM).

This path fixes the physics rather than the constants:

* tables are FLAT per chunk ([C, nc*D]; minor dim is huge, padding is
  negligible) — built host-side so the padded 2D form never exists;
* aggregation runs as a `lax.scan` over node chunks, so gather temps are
  [nc*D, 5f] for one chunk at a time (~100 MB instead of ~10 GB);
* the multi-view score matrix is SYMMETRIC — scores are
  `sigmoid(att[rel]) * mask`, bond relations and the edge mask are
  direction-independent — so A^T = A and the backward feature cotangent
  is THE SAME chunked aggregation applied to g (no reverse-slot tables,
  no scatter); the attention-dictionary gradient is a chunked masked
  histogram accumulated in the scan carry.

Semantics are identical to `EllOps.fused_multiview_pv` / the reference
multi-view layer (`eagcn_pytorch/layers.py:82-92`); parity is asserted in
tests/test_giant.py against the molecule-scale ELL backend.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

V = 5


@dataclasses.dataclass
class GiantBatch:
    """One giant graph with chunked flat tables.  Field names mirror the
    `GraphBatch` attributes `apply_eagcn` reads, so the model code is
    unchanged; `make_ops` dispatches on this type."""
    node_feat: jnp.ndarray    # [N, F]
    node_mol: jnp.ndarray     # [N] i32 (padding -> num_mols)
    node_mask: jnp.ndarray    # [N]
    node_conn: jnp.ndarray    # [N]
    node_tiny: jnp.ndarray    # [N]
    labels: jnp.ndarray       # [B, T]
    mol_mask: jnp.ndarray     # [B]
    mol_size: jnp.ndarray     # [B]
    # chunked flat ELL tables: C chunks of nc nodes, D slots per node
    neigh_c: jnp.ndarray      # [C, nc*D] i32 global node index (pad -> 0)
    rel_c: jnp.ndarray        # [C, V, nc*D] i8 relation ids
    mask_c: jnp.ndarray       # [C, nc*D] f32 slot mask

    @property
    def num_nodes(self) -> int:
        return int(self.node_feat.shape[0])

    @property
    def num_mols(self) -> int:
        return int(self.labels.shape[0])


import jax.tree_util as _jtu

_jtu.register_dataclass(
    GiantBatch,
    data_fields=[f.name for f in dataclasses.fields(GiantBatch)],
    meta_fields=[],
)


def _pick_chunks(n: int, target: int) -> int:
    """Number of chunks: smallest count >= n/target that divides n."""
    if n <= target:
        return 1
    k = -(-n // target)
    while n % k:
        k += 1
    return k


def giant_batch_from_graph(g, label=None, chunk_target: int = 1 << 19,
                           max_degree: int = 8):
    """Host-side builder: MolGraph -> GiantBatch (numpy leaves).  Node
    count is padded to a multiple of 128 that splits into <=chunk_target
    chunks; the flat tables never exist in [N, D] device layout."""
    n, m = g.num_atoms, g.num_bonds
    n_pad = -(-(n + 8) // 128) * 128
    c = _pick_chunks(n_pad // 128, -(-chunk_target // 128))
    while (n_pad // 128) % c:
        n_pad += 128
        c = _pick_chunks(n_pad // 128, -(-chunk_target // 128))
    nc = n_pad // c
    D = max_degree

    b0 = g.bonds[:, 0].astype(np.int64)
    b1 = g.bonds[:, 1].astype(np.int64)
    src = np.concatenate([b0, b1])
    dst = np.concatenate([b1, b0])
    deg = np.bincount(dst, minlength=n_pad).astype(np.int32)
    if m and int(deg.max()) > D:
        raise ValueError(f"degree {int(deg.max())} exceeds {D}")
    order = np.argsort(dst, kind="stable")
    group_start = np.zeros(n_pad, np.int64)
    np.cumsum(deg[:-1], out=group_start[1:])
    slot = np.arange(2 * m, dtype=np.int64) - group_start[dst[order]]
    flat = dst[order] * D + slot                     # flat slot index

    neigh = np.zeros((n_pad * D,), np.int32)
    rel = np.zeros((V, n_pad * D), np.int8)
    mask = np.zeros((n_pad * D,), np.float32)
    neigh[flat] = src[order]
    rel2 = np.concatenate([g.bond_relations, g.bond_relations])
    if int(rel2.max(initial=0)) > 127:
        raise ValueError("relation id exceeds int8")
    rel[:, flat] = rel2[order].T.astype(np.int8)
    mask[flat] = 1.0

    tiny = np.zeros((n_pad,), np.float32)
    tiny[:n] = (n - deg[:n]) * 1e-9
    node_mask = np.zeros((n_pad,), np.float32)
    node_mask[:n] = 1.0
    node_mol = np.full((n_pad,), 1, np.int32)
    node_mol[:n] = 0
    feat = np.zeros((n_pad, g.atom_features.shape[1]), np.float32)
    feat[:n] = g.atom_features
    n_tasks = 1 if label is None else int(np.asarray(label).size)
    lab = np.zeros((1, n_tasks), np.float32)
    if label is not None:
        lab[0] = np.asarray(label, np.float32).reshape(-1)
    return GiantBatch(
        node_feat=feat, node_mol=node_mol, node_mask=node_mask,
        node_conn=(deg[:n_pad] > 0).astype(np.float32), node_tiny=tiny,
        labels=lab, mol_mask=np.ones((1,), np.float32),
        mol_size=np.asarray([float(n)], np.float32),
        neigh_c=neigh.reshape(c, nc * D),
        rel_c=rel.reshape(V, c, nc * D).transpose(1, 0, 2),
        mask_c=mask.reshape(c, nc * D),
    )


# --------------------------------------------------------------------------
# the chunked multi-view aggregation (custom VJP)
# --------------------------------------------------------------------------

def _agg_scan(sigw, y_cat, neigh_c, rel_c, mask_c, f: int, out_dtype):
    """out[n, v*f:(v+1)*f] = sum_d sigw[v, rel_v[n,d]]*mask * y_cat[neigh],
    rows[n, v] = sum_d sigw[v, rel_v[n,d]]*mask — one chunk at a time."""
    c, ncd = neigh_c.shape
    d_slots = ncd // (y_cat.shape[0] // c) if c else 1  # nc*D / nc

    def chunk(_, xs):
        nb, rb, mb = xs                                  # [ncD],[V,ncD],[ncD]
        rows_y = y_cat[nb]                               # [ncD, V*f]
        sig = jnp.stack(
            [jnp.take(sigw[v], rb[v].astype(jnp.int32)) for v in range(V)],
            axis=1) * mb[:, None]                        # [ncD, V] f32
        nc = nb.shape[0] // d_slots
        prod = rows_y.astype(jnp.float32) * jnp.repeat(
            sig, f, axis=1, total_repeat_length=V * f)
        out = prod.reshape(nc, d_slots, V * f).sum(axis=1)
        rows = sig.reshape(nc, d_slots, V).sum(axis=1)
        return None, (out.astype(out_dtype), rows)

    _, (outs, rows) = jax.lax.scan(chunk, None, (neigh_c, rel_c, mask_c))
    return outs.reshape(-1, V * f), rows.reshape(-1, V)


@jax.custom_vjp
def giant_multiview_agg(sigw, y_cat, neigh_c, rel_c, mask_c):
    """sigw [V, C] f32 (sigmoid already applied; rows zero-padded),
    y_cat [N, V*f] per-view features side by side, flat chunked tables.
    -> (agg_cat [N, V*f] at y's dtype, rows [N, V] f32)."""
    f = y_cat.shape[1] // V
    return _agg_scan(sigw, y_cat, neigh_c, rel_c, mask_c, f, y_cat.dtype)


def _giant_fwd(sigw, y_cat, neigh_c, rel_c, mask_c):
    out = giant_multiview_agg(sigw, y_cat, neigh_c, rel_c, mask_c)
    return out, (sigw, y_cat, neigh_c, rel_c, mask_c)


def _giant_bwd(res, cts):
    sigw, y_cat, neigh_c, rel_c, mask_c = res
    g_out, g_rows = cts
    f = y_cat.shape[1] // V
    n_chunks = neigh_c.shape[0]
    g_out = g_out.astype(y_cat.dtype)
    # dy = A^T g = A g: scores depend only on the (symmetric) bond
    # relation and mask, so the score matrix is symmetric and the feature
    # cotangent is the SAME aggregation applied to g_out.
    dy, _ = _agg_scan(sigw, g_out, neigh_c, rel_c, mask_c, f, y_cat.dtype)

    # dsigw[v, c] = sum_edges 1[rel_v=c] * mask * (<y[src], g[dst]>_view
    #              + g_rows[dst, v]) — chunked masked histogram
    g_out_c = g_out.reshape(n_chunks, -1, V * f)
    g_rows_c = g_rows.reshape(n_chunks, -1, V).astype(jnp.float32)
    cmax = sigw.shape[1]

    def chunk(acc, xs):
        nb, rb, mb, gch, grch = xs
        ncd = nb.shape[0]
        nc = gch.shape[0]
        d_slots = ncd // nc
        ry = y_cat[nb].astype(jnp.float32).reshape(nc, d_slots, V, f)
        gc3 = gch.astype(jnp.float32).reshape(nc, V, f)
        dsig = jnp.einsum("ndvf,nvf->ndv", ry, gc3)
        dsig = (dsig + grch[:, None, :]) * mb.reshape(nc, d_slots)[..., None]
        dsig = dsig.reshape(ncd, V)
        upd = []
        for v in range(V):
            onehot = jax.nn.one_hot(rb[v].astype(jnp.int32), cmax,
                                    dtype=jnp.float32)     # [ncD, Cmax]
            upd.append(onehot.T @ dsig[:, v])
        return acc + jnp.stack(upd), None

    dsigw, _ = jax.lax.scan(
        chunk, jnp.zeros_like(sigw),
        (neigh_c, rel_c, mask_c, g_out_c, g_rows_c))
    return dsigw, dy, None, None, None


giant_multiview_agg.defvjp(_giant_fwd, _giant_bwd)


def _pad_sigw(att_list):
    n_rels = tuple(int(a.shape[0]) for a in att_list)
    c_max = -(-max(n_rels) // 8) * 8
    sigw = jnp.zeros((V, c_max), jnp.float32)
    for v, a in enumerate(att_list):
        sigw = sigw.at[v, : n_rels[v]].set(
            jax.nn.sigmoid(a.astype(jnp.float32)))
    return sigw


class GiantEllOps:
    """Backend adapter for GiantBatch.  Supports the fused multi-view
    paths the EAGCN layers use (equal per-view widths); consensus-A /
    GCN / GAT call sites are molecule-scale features and are not
    supported on the giant path."""

    def __init__(self, batch: GiantBatch, compute_dtype=None):
        self.batch = batch
        self.compute_dtype = compute_dtype

    def _cast(self, x):
        dt = self.compute_dtype
        return x.astype(dt) if dt is not None and x.dtype != dt else x

    def fused_multiview_pv(self, att_list, ys):
        fs = [int(y.shape[1]) for y in ys]
        assert len(set(fs)) == 1, "giant path requires equal view widths"
        sigw = _pad_sigw(att_list)
        y_cat = jnp.concatenate([self._cast(y) for y in ys], axis=1)
        b = self.batch
        out, rows = giant_multiview_agg(sigw, y_cat, b.neigh_c, b.rel_c,
                                        b.mask_c)
        f = fs[0]
        return [out[:, v * f:(v + 1) * f] for v in range(V)], rows.T

    def fused_multiview(self, att_list, x):
        """Shared-x views (wide layers): aggregate x under all five score
        sets by tiling x into the per-view slots."""
        x = self._cast(x)
        sigw = _pad_sigw(att_list)
        y_cat = jnp.tile(x, (1, V))
        b = self.batch
        out, rows = giant_multiview_agg(sigw, y_cat, b.neigh_c, b.rel_c,
                                        b.mask_c)
        f = x.shape[1]
        agg = jnp.stack([out[:, v * f:(v + 1) * f] for v in range(V)])
        return agg.astype(jnp.float32), rows.T

    def _unsupported(self, *a, **k):
        raise NotImplementedError(
            "giant backend supports the fused EAGCN path only "
            "(no consensus-A / GCN / GAT on >chip-scale graphs)")

    scores = rowsum = aggregate = multi_aggregate = _unsupported
