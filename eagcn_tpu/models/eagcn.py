"""The EAGCN model family (functional JAX).

Re-design of `eagcn_pytorch/models.py:14-121`: four stacked multi-view
edge-attention layers over the packed mega-graph, sum/mean/diff-pool
readout, BN + 3-layer MLP head.  Width schedule matches `models.py:50-61`:

    layer1: n_afeat           -> sgc1 widths
    layer2: sum(sgc1)         -> sgc2 widths
    layer3: sum(sgc2)         -> 2*sgc2 widths
    layer4: 2*sum(sgc2)       -> 2*sgc2 widths   (last=True, consensus A)

For `structure='Weighted_sum'` each view is re-widened to the concat width
(`models.py:33-47`).  `structure='GCN'`/'GAT' swap in the baseline layers
(`models.py:63-73`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.batching import GraphBatch
from ..ops.aggregate import EllOps, make_ops, segment_readout, tile_readout
from ..utils.config import ModelConfig
from .layers import (
    dense_apply,
    dropout,
    gat_layer_apply,
    gcn_layer_apply,
    init_dense,
    init_gat_layer,
    init_gcn_layer,
    init_multiview_layer,
    multiview_layer_apply,
)
from .norm import batch_norm_apply, init_batch_norm

Params = Dict
State = Dict


def layer_widths(cfg: ModelConfig):
    """(f_in, outs) for the four graph layers (`models.py:30-61`)."""
    ngc1, ngc2 = sum(cfg.sgc1), sum(cfg.sgc2)
    if cfg.structure == "Weighted_sum":
        s1 = (ngc1,) * 5
        s2 = (ngc2,) * 5
        s3 = tuple(2 * w for w in s2)
    else:
        s1, s2 = tuple(cfg.sgc1), tuple(cfg.sgc2)
        s3 = tuple(2 * w for w in cfg.sgc2)
    return [
        (cfg.n_afeat, s1),
        (ngc1, s2),
        (ngc2, s3),
        (2 * ngc2, s3),
    ], ngc1, ngc2


def init_eagcn(key: jax.Array, cfg: ModelConfig) -> Tuple[Params, State]:
    keys = jax.random.split(key, 12)
    widths, ngc1, ngc2 = layer_widths(cfg)
    params: Params = {"layers": []}
    state: State = {"layers": []}

    if cfg.structure in ("Concate", "Weighted_sum"):
        for li, (f_in, outs) in enumerate(widths):
            p, s = init_multiview_layer(
                keys[li], cfg.n_bfeat, f_in, outs, cfg.structure,
                last=(li == 3),
            )
            params["layers"].append(p)
            state["layers"].append(s)
    elif cfg.structure == "GCN":
        dims = [(cfg.n_afeat, ngc1), (ngc1, ngc2), (ngc2, ngc2),
                (ngc2, 2 * ngc2)]                      # models.py:64-67
        for li, (f_in, f_out) in enumerate(dims):
            p, s = init_gcn_layer(keys[li], f_in, f_out)
            params["layers"].append(p)
            state["layers"].append(s)
    elif cfg.structure == "GAT":
        dims = [(cfg.n_afeat, ngc1), (ngc1, ngc2), (ngc2, ngc2),
                (ngc2, 2 * ngc2)]                      # models.py:70-73
        for li, (f_in, f_out) in enumerate(dims):
            p, s = init_gat_layer(keys[li], f_in, f_out)
            params["layers"].append(p)
            state["layers"].append(s)
    else:
        raise ValueError(f"unknown structure {cfg.structure!r}")

    graph_dim = 2 * ngc2
    params["den1"] = init_dense(keys[4], graph_dim, cfg.n_den1)
    params["den2"] = init_dense(keys[5], cfg.n_den1, cfg.n_den2)
    params["den3"] = init_dense(keys[6], cfg.n_den2, cfg.n_tasks)
    for name, dim, k in (
        ("graph_bn", graph_dim, keys[7]),
        ("bn_den1", cfg.n_den1, keys[8]),
        ("bn_den2", cfg.n_den2, keys[9]),
    ):
        p, s = init_batch_norm(k, dim)
        params[name] = p
        state[name] = s

    if cfg.molfp_mode == "pool":
        from .diffpool import init_diff_pooling
        p, s = init_diff_pooling(keys[10], graph_dim, graph_dim, cfg.pool_num)
        params["pool1"], state["pool1"] = p, s
        p, s = init_diff_pooling(keys[11], graph_dim, graph_dim, 1)
        params["pool3"], state["pool3"] = p, s
    return params, state


def apply_eagcn(
    params: Params,
    state: State,
    batch: GraphBatch,
    cfg: ModelConfig,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, State]:
    """Forward pass -> (logits [B,T], atom_reps [N,2*ngc2],
    graph_rep [B,n_den2], new_state).  Mirrors `models.py:96-121`."""
    ops = make_ops(
        batch, cfg.backend,
        compute_dtype=jnp.bfloat16 if cfg.bf16 else None,
        n_rels=(cfg.n_bfeat, 4, 2, 2, 2),
    )
    x = batch.node_feat
    new_state: State = {"layers": []}
    rngs = jax.random.split(rng, 6) if rng is not None else [None] * 6

    # PARITY A/B: phantom zero rows so node-level BN statistics count
    # B * batch-max molecule size, the reference's padded-collate
    # denominator (`utils.py:524`, `layers.py:394-412`)
    bn_extra = None
    if cfg.bn_count_padding:
        n_ref = (jnp.max(batch.mol_size * batch.mol_mask)
                 * jnp.sum(batch.mol_mask))
        bn_extra = n_ref - jnp.sum(batch.node_mask)

    consensus = None
    if cfg.structure in ("Concate", "Weighted_sum"):
        for li in range(4):

            def one_layer(p, s, xx, k, _li=li):
                return multiview_layer_apply(
                    p, s, ops, batch, xx, cfg.structure, cfg.dropout,
                    train, k, last=(_li == 3), axis_name=axis_name,
                    need_consensus=(cfg.molfp_mode == "pool"),
                    pre_transform=cfg.pre_transform, bn_extra=bn_extra,
                )

            if cfg.remat:
                one_layer = jax.checkpoint(one_layer)
            x, consensus, s = one_layer(
                params["layers"][li], state["layers"][li], x,
                rngs[li] if rng is not None else None,
            )
            new_state["layers"].append(s)
    elif cfg.structure == "GCN":
        for li in range(4):
            x, s = gcn_layer_apply(
                params["layers"][li], state["layers"][li], ops, batch, x,
                cfg.dropout, train, rngs[li] if rng is not None else None,
                axis_name=axis_name,
            )
            new_state["layers"].append(s)
    else:  # GAT
        # GAT's softmax normalizes over each node's in-neighborhood, which
        # is only expressible on the neighbor-list layout; the batcher
        # always builds ELL tables, so under tile/pallas configs GAT
        # transparently runs on an ELL adapter instead of raising
        gat_ops = ops
        if not isinstance(ops, EllOps):
            gat_ops = make_ops(
                batch, "ell",
                compute_dtype=jnp.bfloat16 if cfg.bf16 else None,
            )
        for li in range(4):
            x, s = gat_layer_apply(
                params["layers"][li], state["layers"][li], gat_ops, batch, x,
                cfg.dropout, train, rngs[li] if rng is not None else None,
                axis_name=axis_name,
            )
            new_state["layers"].append(s)

    # readout moves bytes at compute width; head / metrics run fp32
    atom_reps = x.astype(jnp.float32)
    B = batch.labels.shape[0]

    if cfg.molfp_mode == "pool" and consensus is not None:
        from .diffpool import diff_pooling_apply
        mol = diff_pooling_apply(params, ops, batch, atom_reps, consensus)
    else:
        # tile-aligned batches carry scatter-free readout tables; giant
        # graphs (GiantBatch has no pool_sel) / tileless shapes fall back
        # to the sorted segment sum
        pool_sel = getattr(batch, "pool_sel", None)
        if (pool_sel is not None and pool_sel.size > 0
                and pool_sel.shape[0] * pool_sel.shape[1]
                == x.shape[0]):
            mol = tile_readout(x, pool_sel, batch.mol_slot,
                               batch.mol_mask, batch.node_mol,
                               batch.node_mask)
        else:
            mol = segment_readout(x, batch.node_mol, B, batch.node_mask)
        if cfg.molfp_mode == "ave":                   # models.py:109-110
            mol = mol / jnp.maximum(batch.mol_size[:, None], 1.0)

    mol, s = batch_norm_apply(
        params["graph_bn"], state["graph_bn"], mol, batch.mol_mask, train,
        axis_name,
    )
    new_state["graph_bn"] = s

    h = dense_apply(params["den1"], mol)
    h, s = batch_norm_apply(
        params["bn_den1"], state["bn_den1"], h, batch.mol_mask, train,
        axis_name,
    )
    new_state["bn_den1"] = s
    h = jax.nn.relu(h)
    h = dropout(h, cfg.dropout, rngs[5] if rng is not None else None, train)
    h = dense_apply(params["den2"], h)
    graph_rep = h                                      # models.py:118
    h, s = batch_norm_apply(
        params["bn_den2"], state["bn_den2"], h, batch.mol_mask, train,
        axis_name,
    )
    new_state["bn_den2"] = s
    h = jax.nn.relu(h)
    logits = dense_apply(params["den3"], h)
    if cfg.molfp_mode == "pool":
        new_state.setdefault("pool1", state.get("pool1", {}))
        new_state.setdefault("pool3", state.get("pool3", {}))
    return logits, atom_reps, graph_rep, new_state
