"""Sparse neighborhood-aggregation backends.

THE hot op of the reference is `torch.bmm(adjs, afms)` over dense padded
B x N x N adjacencies (`eagcn_pytorch/layers.py:38-41`) — O(B*N^2*F) FLOPs
for graphs with ~2 bonds/atom.  Here aggregation is sparse and O(E*F):

* **ell** (default): ELLPACK gather — `x[neigh]` is one vectorized gather of
  [N, D] rows followed by a weighted sum over the tiny degree axis D.  No
  scatter anywhere; maps onto TPU gather + VPU reduction and lets XLA fuse
  the surrounding elementwise work.
* **coo**: `jax.ops.segment_sum` over directed edges — the textbook JAX GNN
  formulation (scatter-add); used for cross-checking and for very skewed
  degree distributions.
* **pallas**: fused Pallas TPU kernel (see `ops/pallas_spmm.py`).

All backends consume the relation-id layout produced by
`data/batching.py` and produce identical results (tests assert allclose).
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp


class GraphOps(Protocol):
    """Backend adapter: attention scoring + row reduction + aggregation in
    a backend-native edge layout."""

    def scores(self, att_w: jnp.ndarray, rel_col: int) -> jnp.ndarray: ...
    def rowsum(self, weights: jnp.ndarray) -> jnp.ndarray: ...
    def aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray: ...


class EllOps:
    """ELLPACK backend: weights live in [N, D] slot layout."""

    def __init__(self, neigh, neigh_rel, neigh_mask):
        self.neigh = neigh          # [N, D] i32
        self.neigh_rel = neigh_rel  # [N, D, 5] i32
        self.neigh_mask = neigh_mask  # [N, D] f32

    def scores(self, att_w: jnp.ndarray, rel_col: int) -> jnp.ndarray:
        """sigmoid(att_w[rel]) per neighbour slot, masked.  Equivalent to
        the reference's 1x1 Conv2d over one-hot relation channels followed
        by sigmoid and adjacency masking (`layers.py:82-83`)."""
        rel = self.neigh_rel[:, :, rel_col]          # [N, D]
        return jax.nn.sigmoid(att_w[rel]) * self.neigh_mask

    def rowsum(self, weights: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(weights, axis=1)

    def aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        gathered = x[self.neigh]                     # [N, D, F] gather
        return jnp.einsum("nd,ndf->nf", weights, gathered)

    def multi_scores(self, att_ws) -> jnp.ndarray:
        """All five views' scores at once -> [N, D, 5] (shares the relation
        lookup; used by the fused layer)."""
        cols = []
        for v, w in enumerate(att_ws):
            rel = self.neigh_rel[:, :, v]
            cols.append(jax.nn.sigmoid(w[rel]) * self.neigh_mask)
        return jnp.stack(cols, axis=-1)

    def multi_aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """weights [N, D, V], x [N, F] -> [N, V, F] with ONE gather shared
        across all V views (the reference re-reads the dense adjacency five
        times per layer; this reads node features once)."""
        gathered = x[self.neigh]                     # [N, D, F]
        return jnp.einsum("ndv,ndf->nvf", weights, gathered)


class CooOps:
    """COO backend: weights live per directed edge [E]."""

    def __init__(self, edge_src, edge_dst, edge_rel, edge_mask, num_nodes: int):
        self.edge_src = edge_src
        self.edge_dst = edge_dst
        self.edge_rel = edge_rel
        self.edge_mask = edge_mask
        self.num_nodes = num_nodes

    def scores(self, att_w: jnp.ndarray, rel_col: int) -> jnp.ndarray:
        rel = self.edge_rel[:, rel_col]
        return jax.nn.sigmoid(att_w[rel]) * self.edge_mask

    def rowsum(self, weights: jnp.ndarray) -> jnp.ndarray:
        return jax.ops.segment_sum(
            weights, self.edge_dst, num_segments=self.num_nodes
        )

    def aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        msgs = weights[:, None] * x[self.edge_src]   # [E, F]
        return jax.ops.segment_sum(
            msgs, self.edge_dst, num_segments=self.num_nodes
        )


def make_ops(batch, backend: str = "ell") -> GraphOps:
    """Builds the aggregation adapter for a GraphBatch."""
    if backend == "ell":
        return EllOps(batch.neigh, batch.neigh_rel, batch.neigh_mask)
    if backend == "coo":
        return CooOps(
            batch.edge_src, batch.edge_dst, batch.edge_rel, batch.edge_mask,
            num_nodes=batch.node_feat.shape[0],
        )
    if backend == "pallas":
        from .pallas_spmm import PallasEllOps

        return PallasEllOps(batch.neigh, batch.neigh_rel, batch.neigh_mask)
    raise ValueError(f"unknown aggregation backend {backend!r}")


def segment_readout(x: jnp.ndarray, node_mol: jnp.ndarray, num_mols: int,
                    node_mask: jnp.ndarray) -> jnp.ndarray:
    """Sum-over-atoms readout (`models.py:108` torch.sum(x2, 1)) for the
    packed mega-graph: segment-sum over molecule ids; padding nodes carry
    segment id == num_mols and fall into a dummy slot that is dropped."""
    x = x * node_mask[:, None]
    summed = jax.ops.segment_sum(x, node_mol, num_segments=num_mols + 1)
    return summed[:num_mols]
