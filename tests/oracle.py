"""Numpy reference oracle for EAGCN.

An independent DENSE re-implementation of the reference's forward math
(`eagcn_pytorch/layers.py:81-95,262-325`, `models.py:96-121`) operating on
per-molecule dense adjacency/relation tensors, used to validate the sparse
packed-mega-graph JAX path end to end (SURVEY.md §4 test strategy #1).

Semantics mirrored exactly:
  * per-view attention  A1 = sigmoid(sum_c w_c Rel_c) * adj
  * A = A1 + sigmoid(self_r)*I*mask2 + (1-adj)*1e-9   (dense per-molecule)
  * row normalization + mask2, then A @ X @ W + b
  * masked BatchNorm over all real atoms of the batch (train stats: biased
    variance; eval: running stats)
  * concat/weighted fusion, sum readout, BN + 3-layer MLP head

Documented divergence vs the torch reference (both sides of our tests use
THIS spec): the (1-adj)*1e-9 tiny mass enters only the row denominator, not
the numerator (contribution ~1e-9 * sum(features), below fp32 resolution);
BN statistics exclude padding rows.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def relu(x):
    return np.maximum(x, 0.0)


def np_params(params):
    """jax pytree -> numpy pytree."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=np.float64), params)


def dense_mol(graph, n_bfeat):
    """MolGraph -> dict of dense tensors via the featurizer's reconstruction."""
    from eagcn_tpu.chem import dense_relation_tensors

    adj, type_t, order_t, arom_t, conj_t, ring_t = dense_relation_tensors(
        graph, n_bfeat
    )
    return {
        "feat": graph.atom_features.astype(np.float64),
        "adj": adj.astype(np.float64),
        "rels": [t.astype(np.float64) for t in (type_t, order_t, arom_t, conj_t, ring_t)],
    }


def batch_norm(x, bn_params, bn_state, train, eps=1e-5):
    if train:
        mean = x.mean(0)
        var = x.var(0)  # biased, matches torch normalization
    else:
        mean, var = bn_state["mean"], bn_state["var"]
    y = (x - mean) / np.sqrt(var + eps)
    return y * bn_params["scale"] + bn_params["bias"]


def view_block(block_params, mols, xs, rel_idx, bn_state, train):
    """One view across all molecules; returns (new xs list, per-mol A1)."""
    w_att = block_params["att"]
    sr = sigmoid(block_params["self_r"])
    aggregated = []
    scores = []
    for m, x in zip(mols, xs):
        n = m["adj"].shape[0]
        rel = m["rels"][rel_idx]
        conv = np.einsum("c,cij->ij", w_att, rel)
        a1 = sigmoid(conv) * m["adj"]
        mask2 = (m["adj"].max(1) > 0).astype(np.float64)
        a = a1 + sr * np.diag(mask2) + (1.0 - m["adj"]) * 1e-9
        rowsum = a.sum(1, keepdims=True)
        # numerator tiny-mass dropped per spec: rebuild A without the tiny
        # entries but keep them in the denominator
        a_num = a1 + sr * np.diag(mask2)
        a_norm = (a_num / rowsum) * mask2[:, None]
        aggregated.append(a_norm @ x)
        scores.append(a1)
    h = np.concatenate(aggregated, axis=0)
    h = h @ block_params["w"] + block_params["b"]
    h = batch_norm(h, block_params["bn"], bn_state["bn"], train)
    h = relu(h)
    out = []
    off = 0
    for m in mols:
        n = m["adj"].shape[0]
        out.append(h[off:off + n])
        off += n
    return out, scores


def multiview_layer(layer_params, layer_state, mols, xs, structure, train,
                    last=False):
    all_views = []
    all_scores = []
    for v in range(5):
        hv, sv = view_block(
            layer_params["blocks"][v], mols, xs, v,
            layer_state["blocks"][v], train,
        )
        all_views.append(hv)
        all_scores.append(sv)
    fused = []
    for i, m in enumerate(mols):
        mask2 = (m["adj"].max(1) > 0).astype(np.float64)
        if structure == "Concate":
            f = np.concatenate([all_views[v][i] for v in range(5)], axis=1)
            f = f * mask2[:, None]
        else:
            f = sum(layer_params["ave"][v] * all_views[v][i] for v in range(5))
        fused.append(f)
    consensus = None
    if last:
        consensus = []
        sr = sigmoid(layer_params["self_r"])
        for i, m in enumerate(mols):
            ave = sum(layer_params["ave_A"][v] * all_scores[v][i] for v in range(5))
            a = sigmoid(ave) * m["adj"]
            mask2 = (m["adj"].max(1) > 0).astype(np.float64)
            full = a + sr * np.diag(mask2) + (1.0 - m["adj"]) * 1e-9
            rowsum = full.sum(1, keepdims=True)
            a_norm = ((a + sr * np.diag(mask2)) / rowsum) * mask2[:, None]
            consensus.append(a_norm)
    return fused, consensus


def oracle_forward(params, state, mols, cfg, train=False):
    """Full forward pass -> (logits [B,T], atom_reps list, graph_rep)."""
    xs = [m["feat"] for m in mols]
    consensus = None
    for li in range(4):
        xs, consensus = multiview_layer(
            params["layers"][li], state["layers"][li], mols, xs,
            cfg.structure, train, last=(li == 3),
        )
    atom_reps = xs

    if cfg.molfp_mode == "pool":
        pooled = []
        p = params["pool1"]
        for i, m in enumerate(mols):
            ax = consensus[i] @ xs[i]
            x_feat = relu(ax @ p["feature_w"])
            s_log = ax @ p["assign_w"]
            e = np.exp(s_log - s_log.max(1, keepdims=True))
            s = e / e.sum(1, keepdims=True)
            pooled.append(relu(s.T @ x_feat).sum(0))
        mol_rep = np.stack(pooled)
    else:
        mol_rep = np.stack([x.sum(0) for x in xs])
        if cfg.molfp_mode == "ave":
            sizes = np.array([m["adj"].shape[0] for m in mols], dtype=np.float64)
            mol_rep = mol_rep / sizes[:, None]

    mol_rep = batch_norm(mol_rep, params["graph_bn"], state["graph_bn"], train)
    h = mol_rep @ params["den1"]["w"]
    h = batch_norm(h, params["bn_den1"], state["bn_den1"], train)
    h = relu(h)
    h = h @ params["den2"]["w"]
    graph_rep = h
    h = batch_norm(h, params["bn_den2"], state["bn_den2"], train)
    h = relu(h)
    logits = h @ params["den3"]["w"]
    return logits, atom_reps, graph_rep
