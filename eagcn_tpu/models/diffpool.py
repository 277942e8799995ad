"""Differentiable pooling readout (`--molfp pool`).

Sparse re-design of `eagcn_pytorch/layers.py:492-506` + `models.py:104-106`:
the consensus attention adjacency from layer 4 drives one Diff_Pooling
stage; cluster assignment S = softmax_K(A X W) is computed per node, and the
pooled representation S^T X is a segment-wise outer-product sum — no dense
B x N x N anywhere.  The reference's `A_update = S^T A S` is computed there
but never consumed afterwards (`models.py:104-106` sums the pooled features
immediately), so it is omitted; `pool3` parameters are kept for state-dict
parity (`models.py:92` defines it, forward never calls it)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import consensus_aggregate


def init_diff_pooling(key, f_in: int, f_out: int, out_size: int):
    """Two GraphConv_base weights, N(0, 0.02) via weights_init, no bias
    (`layers.py:493-496` uses the bias=False default)."""
    k1, k2 = jax.random.split(key)
    params = {
        "feature_w": 0.02 * jax.random.normal(k1, (f_in, f_out), jnp.float32),
        "assign_w": 0.02 * jax.random.normal(k2, (f_in, out_size), jnp.float32),
    }
    return params, {}


def diff_pooling_apply(params, ops, batch, x, consensus):
    """Returns pooled per-molecule features [B, F] (already summed over the
    cluster axis, `models.py:105-106`)."""
    p = params["pool1"]
    ax = consensus_aggregate(consensus, ops, batch, x)       # A_hat @ X
    x_feat = jax.nn.relu(ax @ p["feature_w"])                 # [N, F]
    s_logits = ax @ p["assign_w"]                             # [N, K]
    s = jax.nn.softmax(s_logits, axis=-1)
    s = s * batch.node_mask[:, None]
    # pooled[b, k, f] = sum_{i in mol b} s[i,k] * x_feat[i,f]
    outer = s[:, :, None] * x_feat[:, None, :]                # [N, K, F]
    B = batch.labels.shape[0]
    pooled = jax.ops.segment_sum(
        outer, batch.node_mol, num_segments=B + 1
    )[:B]
    pooled = jax.nn.relu(pooled)                              # layers.py:503
    return jnp.sum(pooled, axis=1)                            # models.py:106
