"""FULL-model edge-partitioned training: the whole 4-layer 5-view EAGCN
(forward + backward + Adam) over a node/edge-partitioned giant graph under
`shard_map` on the 'graph' mesh axis.

This is the capability SURVEY §2.2 row 3 specifies (the graph analogue of
sequence parallelism): when ONE graph exceeds a chip, nodes are partitioned
contiguously (`edge_partition.partition_giant_graph`), every layer's
aggregation satisfies remote edge sources through a halo exchange over ICI,
BatchNorm moments are psum'd so statistics are GLOBAL, the readout is a
psum'd masked sum, and parameter gradients are psum'd — the update is
bitwise-identical to training the same graph on one big device
(tests/test_sharded_model.py asserts loss + grad parity on a CPU mesh).

Layer math is NOT re-implemented here: `EllHaloOps` plugs the halo-buffer
gather into the same `multiview_layer_apply` / `batch_norm_apply` used by
the single-device model (`models/layers.py`), so semantic drift between the
single-device and distributed paths is structurally impossible.

Reference counterpart: none — the reference is single-device
(`eagcn_pytorch/train.py:124-128`); this is the BASELINE.json north-star
component.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import dense_apply, dropout, multiview_layer_apply
from ..models.norm import batch_norm_apply
from ..ops.aggregate import edge_scores
from ..utils.config import ModelConfig
from .edge_partition import (
    PartitionedGraph, halo_exchange, halo_exchange_packed,
)


@dataclasses.dataclass
class _ShardBatchShim:
    """The per-node fields `multiview_layer_apply` reads from a GraphBatch,
    restricted to this shard."""
    node_conn: jnp.ndarray
    node_tiny: jnp.ndarray
    node_mask: jnp.ndarray


class EllHaloOps:
    """ELLPACK aggregation whose source gather resolves through a
    [own nodes | halo] buffer; the halo is exchanged over `axis_name` ONCE
    per multi-view call (all five views share it, like the single-device
    fused path shares one feature read).

    `packed=True` (default) ships only the referenced rows via all_to_all
    (bytes ∝ halo size); `packed=False` all-gathers the full feature array
    (the round-3 v1 behavior, kept for A/B measurement).

    `overlap=True` (default) OVERLAPS the exchange with local aggregation
    (SURVEY §2.2 row 3 'double-buffered'): the all_to_all is issued first,
    the full-size einsum runs on local-source slots only (no data
    dependence on the collective, so XLA's latency-hiding scheduler keeps
    it in flight underneath), and only a compact per-halo-edge COO tail —
    0.1-1% of edges on the locality-window stress graphs — waits for the
    received rows.  `overlap=False` is the exchange-then-gather schedule
    kept for A/B."""

    def __init__(self, part_local, axis_name: str = "graph",
                 packed: bool = True, overlap: bool = True):
        self.neigh = part_local.neigh            # [Ns, D] into [0, Ns+S*Hp)
        self.neigh_rel = part_local.neigh_rel    # [Ns, D, 5]
        self.neigh_mask = part_local.neigh_mask  # [Ns, D]
        self.halo_ids = part_local.halo_ids      # [S*Hp] global ids
        self.send_ids = part_local.send_ids      # [S, Hp] local rows
        self.he_dst = part_local.halo_edge_dst   # [Eh]
        self.he_slot = part_local.halo_edge_slot # [Eh]
        self.he_src = part_local.halo_edge_src   # [Eh] into halo [0,S*Hp)
        self.he_mask = part_local.halo_edge_mask # [Eh]
        self.axis_name = axis_name
        self.packed = packed
        self.overlap = overlap
        self.compute_dtype = None

    def _halo(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.packed:
            return halo_exchange_packed(x, self.send_ids, self.axis_name)
        return halo_exchange(x, self.halo_ids, self.axis_name)

    def _buffer(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([x, self._halo(x)], axis=0)

    def scores(self, att_w: jnp.ndarray, rel_col: int) -> jnp.ndarray:
        rel = self.neigh_rel[:, :, rel_col]
        return edge_scores(att_w, rel, self.neigh_mask)

    def rowsum(self, weights: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(weights, axis=1)

    def _overlapped(self, weights: jnp.ndarray, x: jnp.ndarray,
                    spec: str) -> jnp.ndarray:
        """Local-slot einsum (collective-independent) + halo-edge COO tail.
        weights [Ns, D] or [Ns, D, V]; returns [Ns, F] / [Ns, V, F]."""
        ns = x.shape[0]
        halo = self._halo(x)                     # issued FIRST; consumed last
        is_local = self.neigh < ns
        idx_local = jnp.where(is_local, self.neigh, 0)
        w_local = weights * (is_local.astype(weights.dtype)
                             [..., None] if weights.ndim == 3
                             else is_local.astype(weights.dtype))
        out = jnp.einsum(spec, w_local, x[idx_local],
                         preferred_element_type=jnp.float32)
        # tiny tail: one gathered weight + one received row per halo edge
        w_h = weights[self.he_dst, self.he_slot]           # [Eh] / [Eh, V]
        w_h = w_h * (self.he_mask[:, None] if w_h.ndim == 2
                     else self.he_mask)
        g_h = halo[self.he_src].astype(w_h.dtype)          # [Eh, F]
        if weights.ndim == 3:
            contrib = w_h[:, :, None] * g_h[:, None, :]    # [Eh, V, F]
        else:
            contrib = w_h[:, None] * g_h                   # [Eh, F]
        tail = jax.ops.segment_sum(contrib, self.he_dst, num_segments=ns)
        return out + tail.astype(out.dtype)

    def aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        if self.overlap:
            return self._overlapped(weights, x, "nd,ndf->nf")
        gathered = self._buffer(x)[self.neigh]            # [Ns, D, F]
        return jnp.einsum("nd,ndf->nf", weights, gathered,
                          preferred_element_type=jnp.float32)

    def fused_multiview_pv(self, att_list, ys):
        """Narrow-side rewrite on the halo path: per-view features ys
        (five [Ns, f_v]) are CONCATENATED into one packed exchange (the
        halo bytes stay one message per layer; 5*f_v vs f_in floats per
        row), then each view aggregates its own slice.  Returns
        (agg list of [Ns, f_v] f32, rows [5, Ns]) like the tile backend."""
        fs = [int(y.shape[1]) for y in ys]
        offs = np.concatenate([[0], np.cumsum(fs)])
        ycat = jnp.concatenate(ys, axis=1)               # [Ns, 5f]
        ns = ycat.shape[0]
        sig_all = jnp.stack(
            [self.scores(att_list[v], v) for v in range(5)], axis=-1)
        rows = jnp.stack([sig_all[..., v].sum(1) for v in range(5)]
                         ).astype(jnp.float32)           # [5, Ns]
        if self.overlap:
            halo = self._halo(ycat)
            is_local = self.neigh < ns
            idx_local = jnp.where(is_local, self.neigh, 0)
            gathered = ycat[idx_local]                   # [Ns, D, 5f]
            w_local = sig_all * is_local[..., None].astype(sig_all.dtype)
            agg = [jnp.einsum("nd,ndf->nf", w_local[..., v],
                              gathered[:, :, offs[v]:offs[v + 1]],
                              preferred_element_type=jnp.float32)
                   for v in range(5)]
            w_h = sig_all[self.he_dst, self.he_slot]     # [Eh, 5]
            w_h = w_h * self.he_mask[:, None]
            g_h = halo[self.he_src]                      # [Eh, 5f]
            for v in range(5):
                contrib = (w_h[:, v:v + 1]
                           * g_h[:, offs[v]:offs[v + 1]].astype(w_h.dtype))
                agg[v] = agg[v] + jax.ops.segment_sum(
                    contrib, self.he_dst, num_segments=ns
                ).astype(agg[v].dtype)
            return agg, rows
        buf = self._buffer(ycat)[self.neigh]             # [Ns, D, 5f]
        agg = [jnp.einsum("nd,ndf->nf", sig_all[..., v],
                          buf[:, :, offs[v]:offs[v + 1]],
                          preferred_element_type=jnp.float32)
               for v in range(5)]
        return agg, rows

    def multi_aggregate(self, weights: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """weights [Ns, D, V], x [Ns, F] -> [Ns, V, F]; ONE halo exchange +
        ONE gather shared by all views."""
        if self.overlap:
            return self._overlapped(weights, x, "ndv,ndf->nvf")
        gathered = self._buffer(x)[self.neigh]            # [Ns, D, F]
        return jnp.einsum("ndv,ndf->nvf", weights, gathered,
                          preferred_element_type=jnp.float32)


def apply_eagcn_partitioned(
    params,
    state,
    part_local,                    # PartitionedGraph leaves, shard axis gone
    cfg: ModelConfig,
    n_graphs: int = 1,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    axis_name: str = "graph",
    packed: bool = True,
    overlap: bool = True,
    pre_transform: bool = True,
) -> Tuple[jnp.ndarray, dict]:
    """Per-shard body (call inside shard_map): the full EAGCN forward on a
    batch of `n_graphs` edge-partitioned giant graphs -> (logits [G, T],
    new_state).  The readout is a local segment-sum over `node_mol` psum'd
    over shards (`models.py:108` semantics across shard boundaries)."""
    ops = EllHaloOps(part_local, axis_name, packed=packed, overlap=overlap)
    shim = _ShardBatchShim(
        node_conn=part_local.node_conn,
        node_tiny=part_local.node_tiny,
        node_mask=part_local.node_mask,
    )
    if rng is not None:
        # node-level dropout is independent per shard; the HEAD dropout
        # must stay replicated (the head computes identically on every
        # shard after the psum'd readout — see make_partitioned_train_step)
        rng_local = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rngs = list(jax.random.split(rng_local, 5)) + [rng]
    else:
        rngs = [None] * 6

    x = part_local.node_feat
    new_state: dict = {"layers": []}
    for li in range(4):
        x, _, s = multiview_layer_apply(
            params["layers"][li], state["layers"][li], ops, shim, x,
            cfg.structure, cfg.dropout, train, rngs[li], last=(li == 3),
            axis_name=axis_name, need_consensus=False,
            pre_transform=pre_transform,
        )
        new_state["layers"].append(s)

    x = x.astype(jnp.float32)
    local = jax.ops.segment_sum(
        x * part_local.node_mask[:, None], part_local.node_mol,
        num_segments=n_graphs + 1,
    )[:n_graphs]                                         # [G, F]
    mol = jax.lax.psum(local, axis_name)
    ones = jnp.ones((n_graphs,), jnp.float32)

    mol, s = batch_norm_apply(params["graph_bn"], state["graph_bn"], mol,
                              ones, train)
    new_state["graph_bn"] = s
    h = dense_apply(params["den1"], mol)
    h, s = batch_norm_apply(params["bn_den1"], state["bn_den1"], h, ones,
                            train)
    new_state["bn_den1"] = s
    h = jax.nn.relu(h)
    h = dropout(h, cfg.dropout, rngs[5] if rng is not None else None, train)
    h = dense_apply(params["den2"], h)
    h, s = batch_norm_apply(params["bn_den2"], state["bn_den2"], h, ones,
                            train)
    new_state["bn_den2"] = s
    h = jax.nn.relu(h)
    logits = dense_apply(params["den3"], h)
    return logits, new_state


def make_partitioned_train_step(cfg: ModelConfig, tx, mesh,
                                n_graphs: int = 1,
                                axis_name: str = "graph",
                                packed: bool = True,
                                overlap: bool = True,
                                pre_transform: bool = True):
    """Jitted full-model train step over a batch of edge-partitioned giant
    graphs: (params, state, opt_state, part [S,...], labels [G,T], rng) ->
    (params, state, opt_state, loss).  Regression MSE on the graph-level
    outputs; graph-layer gradients psum'd over the graph axis."""
    import optax
    from jax.sharding import PartitionSpec as P

    n_shards = int(np.prod([mesh.shape[a] for a in (axis_name,)]))

    def per_shard(params, state, part, labels, rng):
        local = jax.tree_util.tree_map(lambda a: a[0], part)

        def loss_fn(p):
            logits, new_state = apply_eagcn_partitioned(
                p, state, local, cfg, n_graphs=n_graphs, train=True,
                rng=rng, axis_name=axis_name, packed=packed,
                overlap=overlap, pre_transform=pre_transform,
            )
            loss = jnp.mean((logits - labels) ** 2)
            # differentiate loss/n: under check_vma=False the transpose of
            # the readout's `psum(local)` is ANOTHER psum, so the cotangent
            # arriving at each shard's local activations is n_shards x the
            # true one.  Scaling the (replicated) loss by 1/n makes that
            # cotangent exact; psum'ing ALL grads below then restores the
            # full gradient for both the graph layers (true partial sums)
            # and the head (n copies of full_grad/n).
            return loss / n_shards, (loss, new_state)

        (_, (loss, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.psum(grads, axis_name)
        return loss, grads, new_state

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, state, opt_state, part, labels, rng):
        loss, grads, new_state = sharded(params, state, part, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return step


def make_partitioned_eval(cfg: ModelConfig, mesh, n_graphs: int = 1,
                          axis_name: str = "graph",
                          packed: bool = True,
                          overlap: bool = True,
                          pre_transform: bool = True):
    """Jitted forward over the partitioned graph batch -> logits [G, T]."""
    from jax.sharding import PartitionSpec as P

    def per_shard(params, state, part):
        local = jax.tree_util.tree_map(lambda a: a[0], part)
        logits, _ = apply_eagcn_partitioned(
            params, state, local, cfg, n_graphs=n_graphs, train=False,
            axis_name=axis_name, packed=packed, overlap=overlap,
            pre_transform=pre_transform,
        )
        return logits

    return jax.jit(jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    ))
