"""EAGCN building blocks as pure functions over parameter pytrees.

Sparse re-design of `eagcn_pytorch/layers.py`:

* `GraphConv_block` (`layers.py:52-95`) -> `view_block`: the 1x1 Conv2d
  over one-hot relation channels collapses to an embedding lookup
  ``sigmoid(att_w[relation_id])`` per edge; adjacency masking is implicit
  in the edge list; row normalization is a per-node reduction.
* `GraphConv_Layer` (`layers.py:262-325`) -> `multiview_layer`: five view
  blocks sharing ONE node-feature gather, fused per the ELLPACK backend.
* Attention math reproduced from `layers.py:82-90`:
      A = sigmoid(att)*adj + sigmoid(self_r)*I*mask + (1-adj)*1e-9
      A = (A / A.rowsum()) * mask
  The (1-adj)*1e-9 "tiny" mass enters the row DENOMINATOR exactly
  (precomputed per node as `(n_mol - deg) * 1e-9`, `data/batching.py`);
  its off-neighbor numerator contribution (~1e-9 * sum of features) is
  dropped — below fp32 resolution of the activations, documented in
  SURVEY §7.3.
* Dropout follows torch `F.dropout` (inverted scaling), `layers.py:94`.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.aggregate import EllOps, GraphOps
from .norm import batch_norm_apply, init_batch_norm

Params = Dict
State = Dict

# relation-id column for each of the five views: atom-pair type, bond order,
# aromaticity, conjugation, ring membership (`layers.py:306-310`).
VIEW_REL_COLUMNS = (0, 1, 2, 3, 4)


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
            train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate

    # checkpoint: the backward recomputes the bernoulli mask from the rng
    # (hardware-cheap with rbg keys) instead of storing an [N, F] bool
    # residual — saves the mask's HBM round trip (~0.9 GB/step at bench
    # widths) with bitwise-identical results (same key -> same bits)
    @jax.checkpoint
    def _drop(x, rng):
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    return _drop(x, rng)


# --------------------------------------------------------------------------
# single-view edge-attention block  (GraphConv_block, layers.py:52-95)
# --------------------------------------------------------------------------

def init_view_block(key, n_rel: int, f_in: int, f_out: int):
    """Init parity with the reference:
    * att (1x1 conv over one-hot channels): kaiming_uniform(a=sqrt(5)) ==
      U(+-1/sqrt(n_rel)) (torch Conv2d default on fan_in=n_rel)
    * graph-conv weight: N(0, 0.02) via `weights_init` (`utils.py:702-705`)
    * graph-conv bias: U(+-1/sqrt(f_out)) (`layers.py:32-36`)
    * self_r: U(-0.01, 0.01) (`layers.py:77-79`)
    """
    k_att, k_w, k_b, k_bn = jax.random.split(key, 4)
    bn_params, bn_state = init_batch_norm(k_bn, f_out)
    params = {
        "att": _uniform(k_att, (n_rel,), 1.0 / math.sqrt(n_rel)),
        "w": 0.02 * jax.random.normal(k_w, (f_in, f_out), jnp.float32),
        "b": _uniform(k_b, (f_out,), 1.0 / math.sqrt(f_out)),
        "self_r": _uniform(jax.random.fold_in(key, 7), (), 0.01),
        "bn": bn_params,
    }
    return params, {"bn": bn_state}


def view_block_apply(
    params, state, ops: GraphOps, batch, x, rel_col: int,
    drop_rate: float, train: bool, rng, axis_name=None,
    precomputed_agg: Optional[jnp.ndarray] = None,
    precomputed_sig: Optional[jnp.ndarray] = None,
    precomputed_rowsum: Optional[jnp.ndarray] = None,
    need_sig: bool = True,
    pre_y: Optional[jnp.ndarray] = None,
    bn_extra=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], State]:
    """Returns (activations [N, f_out], edge scores in backend layout,
    new state).  The edge scores correspond to the reference's returned
    ``A1 = sigmoid(att)*adj`` (`layers.py:83,95`).  When the layer already
    ran the fused multi-view aggregation, `precomputed_agg`/`sig`/`rowsum`
    skip the per-view work; with `need_sig=False` (fused kernel path —
    scores never leave VMEM) the returned sig is None unless something
    below still requires it.

    `pre_y` marks the narrow-side rewrite: the caller already computed
    y = x @ W and `precomputed_agg` aggregated y, so only normalization +
    bias remain here ((A@X)@W == A@(X@W) — the row-norm denominator is a
    per-node scalar and commutes with the weight matmul)."""
    dt = getattr(ops, "compute_dtype", None)
    sig = precomputed_sig
    if sig is None and (need_sig or precomputed_agg is None
                        or precomputed_rowsum is None):
        sig = ops.scores(params["att"], rel_col)
    if pre_y is not None:
        agg = precomputed_agg
        rows = precomputed_rowsum
        h = _normalize_with_self(params, batch, pre_y, rows, agg)
        h = h + params["b"]
    else:
        agg = (precomputed_agg if precomputed_agg is not None
               else ops.aggregate(sig, x))
        rows = (precomputed_rowsum if precomputed_rowsum is not None
                else ops.rowsum(sig))
        h = _normalize_with_self(params, batch, x, rows, agg)
        if dt is not None:
            from ..ops.matmul import dot_bf16

            h = dot_bf16(h, params["w"]) + params["b"]
        else:
            h = h @ params["w"] + params["b"]
    h_bn, bn_state = batch_norm_apply(
        params["bn"], state["bn"], h, batch.node_mask, train, axis_name,
        extra_count=bn_extra,
    )
    h = jax.nn.relu(h_bn)
    if dt is not None:
        # store block activations at compute width so the NEXT layer's
        # reads are half-width (BN/matmul above accumulated fp32); cast
        # BEFORE dropout so the mask-multiply moves half the bytes too
        h = h.astype(dt)
    h = dropout(h, drop_rate, rng, train)
    return h, sig, {"bn": bn_state}


def _normalize_with_self(params, batch, x, rows, agg):
    """(A / rowsum) * mask with learned self-loop (`layers.py:83-92`).
    `rows` is the per-node score row-sum in node layout [N]."""
    sr = jax.nn.sigmoid(params["self_r"])
    conn = batch.node_conn
    denom = rows + sr * conn + batch.node_tiny + (1.0 - conn)
    return (agg + (sr * conn)[:, None] * x) / denom[:, None] * conn[:, None]


# --------------------------------------------------------------------------
# five-view layer  (GraphConv_Layer, layers.py:262-325)
# --------------------------------------------------------------------------

def init_multiview_layer(
    key, n_bfeat: int, f_in: int, outs: Sequence[int],
    structure: str, last: bool = False,
):
    """outs: the five per-view widths (node_out_1..5).  Relation channel
    counts are fixed at (n_bfeat, 4, 2, 2, 2) (`layers.py:269-273`)."""
    n_rels = (n_bfeat, 4, 2, 2, 2)
    keys = jax.random.split(key, 8)
    blocks, bstates = [], []
    for v in range(5):
        p, s = init_view_block(keys[v], n_rels[v], f_in, outs[v])
        blocks.append(p)
        bstates.append(s)
    params: Params = {"blocks": blocks}
    state: State = {"blocks": bstates}
    if structure == "Weighted_sum":
        params["ave"] = _uniform(keys[5], (5,), 1.0 / math.sqrt(5))
    if last:
        params["ave_A"] = _uniform(keys[6], (5,), 1.0 / math.sqrt(5))
        params["self_r"] = _uniform(keys[7], (), 0.01)
    return params, state


def _multiview_layer_fused(
    params, state, ops: GraphOps, batch, x, structure: str,
    drop_rate: float, train: bool, rng, axis_name, pre_transform: bool,
    bn_extra=None,
):
    """Fast path for EQUAL per-view widths (every reference benchmark
    config): the five per-view projections collapse into ONE matmul, the
    five BatchNorms into ONE BN over the concatenated features (statistics
    are per-feature, so this is the same math), and the five dropouts into
    one mask.  Cuts the per-layer op count ~5x — on TPU the small per-view
    dots ran far below MXU peak and each BN cost full f32 passes over HBM.
    Semantics: `eagcn_pytorch/layers.py:81-95` per view, `:313-316`
    fusion."""
    blocks = params["blocks"]
    atts = [blocks[v]["att"] for v in range(5)]
    f = int(blocks[0]["w"].shape[1])
    f_in = int(x.shape[1])
    dt = getattr(ops, "compute_dtype", None)
    conn = batch.node_conn

    w_cat = jnp.concatenate([blocks[v]["w"] for v in range(5)], axis=1)
    b_cat = jnp.concatenate([blocks[v]["b"] for v in range(5)])
    sr = jnp.stack([jax.nn.sigmoid(blocks[v]["self_r"])
                    for v in range(5)])                     # [5]

    use_pre = (pre_transform and f < f_in
               and hasattr(ops, "fused_multiview_pv"))
    if use_pre:
        # narrow-side rewrite: y = x @ W first ((A@X)@W == A@(X@W); the
        # row norm is a per-node scalar and commutes), ONE [N,f_in]@[f_in,5f]
        if dt is not None:
            from ..ops.matmul import dot_bf16

            y = dot_bf16(x, w_cat, jnp.dtype(dt).name)  # half-width output buffer
        else:
            y = jnp.einsum("nf,fo->no", x, w_cat,
                           preferred_element_type=jnp.float32)
        ys = [y[:, v * f:(v + 1) * f] for v in range(5)]
        agg_list, rows = ops.fused_multiview_pv(atts, ys)   # 5x[N,f], [5,N]
        denom = (rows + sr[:, None] * conn[None] + batch.node_tiny[None]
                 + (1.0 - conn)[None])                      # [5, N]
        parts = [(agg_list[v]
                  + (sr[v] * conn)[:, None] * ys[v].astype(jnp.float32))
                 / denom[v][:, None] for v in range(5)]
        if dt is not None:
            # keep the [N, 5f] BN input at compute width: the f32 concat +
            # BN reads of the widest layers measured ~2.5 GB/step of HBM;
            # normalization itself accumulated fp32 above, and BN
            # re-normalizes so the half-width rounding is benign
            h = jnp.concatenate([p.astype(dt) for p in parts], axis=1) \
                + b_cat.astype(dt)
        else:
            h = jnp.concatenate(parts, axis=1) + b_cat
    else:
        if hasattr(ops, "fused_multiview"):
            agg_all, rows = ops.fused_multiview(atts, x)    # [5,N,f_in],[5,N]
        else:
            sig_all = jnp.stack(
                [ops.scores(atts[v], VIEW_REL_COLUMNS[v])
                 for v in range(5)], axis=-1)        # [N, D, 5] ell / [E, 5] coo
            agg_all = ops.multi_aggregate(sig_all, x).transpose(1, 0, 2)
            rows = jnp.stack([ops.rowsum(sig_all[..., v])
                              for v in range(5)]).astype(jnp.float32)
        denom = (rows + sr[:, None] * conn[None] + batch.node_tiny[None]
                 + (1.0 - conn)[None])                      # [5, N]
        hs = ((agg_all + sr[:, None, None] * (conn[:, None] * x.astype(
            jnp.float32))[None]) / denom[:, :, None])       # [5, N, f_in]
        w_stack = jnp.stack([blocks[v]["w"] for v in range(5)])  # [5,f_in,f]
        if dt is not None:
            from ..ops.matmul import bmm_bf16

            h = bmm_bf16(hs, w_stack, jnp.dtype(dt).name)              # [5, N, f]
            h = (h.transpose(1, 0, 2).reshape(-1, 5 * f)
                 + b_cat.astype(dt))
        else:
            h = jnp.einsum("vnf,vfo->vno", hs, w_stack,
                           preferred_element_type=jnp.float32)
            h = h.transpose(1, 0, 2).reshape(-1, 5 * f) + b_cat

    # one BN over the concatenation == five per-view BNs (per-feature stats)
    bn_p = {
        "scale": jnp.concatenate([blocks[v]["bn"]["scale"]
                                  for v in range(5)]),
        "bias": jnp.concatenate([blocks[v]["bn"]["bias"]
                                 for v in range(5)]),
    }
    bn_s = {
        "mean": jnp.concatenate([state["blocks"][v]["bn"]["mean"]
                                 for v in range(5)]),
        "var": jnp.concatenate([state["blocks"][v]["bn"]["var"]
                                for v in range(5)]),
    }
    h_bn, bn_s2 = batch_norm_apply(bn_p, bn_s, h, batch.node_mask, train,
                                   axis_name, extra_count=bn_extra)
    h = jax.nn.relu(h_bn)
    if dt is not None:
        h = h.astype(dt)
    h = dropout(h, drop_rate, rng, train)

    act_dt = h.dtype
    if structure == "Concate":
        fused = h * conn[:, None].astype(act_dt)            # layers.py:313
    else:                                                   # Weighted_sum
        fused = jnp.einsum(
            "nvf,v->nf", h.reshape(-1, 5, f),
            params["ave"].astype(act_dt))                   # layers.py:314-316

    new_bstates = [
        {"bn": {"mean": bn_s2["mean"][v * f:(v + 1) * f],
                "var": bn_s2["var"][v * f:(v + 1) * f]}}
        for v in range(5)
    ]
    return fused, None, {"blocks": new_bstates}


def multiview_layer_apply(
    params, state, ops: GraphOps, batch, x, structure: str,
    drop_rate: float, train: bool, rng, last: bool = False, axis_name=None,
    need_consensus: bool = True, pre_transform: bool = True, bn_extra=None,
):
    """Returns (fused activations, consensus-A info or None, new state).

    `pre_transform` enables the narrow-side rewrite on backends that
    support per-view aggregation (tile/pallas): when every view's output
    width is below the input width, compute y_v = x @ W_v FIRST and
    aggregate the y_v — cuts aggregation FLOPs by f_in/f_out (3.5x at
    tox21 widths) with bitwise-identical math up to float reordering."""
    outs_all = [int(params["blocks"][v]["w"].shape[1]) for v in range(5)]
    if (len(set(outs_all)) == 1 and not (last and need_consensus)
            and structure in ("Concate", "Weighted_sum")):
        return _multiview_layer_fused(
            params, state, ops, batch, x, structure, drop_rate, train,
            rng if rng is None else jax.random.fold_in(rng, 0),
            axis_name, pre_transform, bn_extra,
        )
    rngs = jax.random.split(rng, 5) if rng is not None else [None] * 5
    blocks = params["blocks"]
    atts = [blocks[v]["att"] for v in range(5)]
    outs = [int(blocks[v]["w"].shape[1]) for v in range(5)]
    f_in = int(x.shape[1])
    dt = getattr(ops, "compute_dtype", None)
    use_pre = (pre_transform and hasattr(ops, "fused_multiview_pv")
               and max(outs) < f_in)

    # fused paths: score all five views and read node features ONCE
    # (the reference re-reads the dense adjacency per view, layers.py:306-310)
    agg_list = sig_all = rows_all = ys = None
    if use_pre:
        ys = []
        for v in range(5):
            if dt is not None:
                from ..ops.matmul import dot_bf16

                y = dot_bf16(x, blocks[v]["w"]).astype(dt)
            else:
                y = jnp.einsum("nf,fo->no", x, blocks[v]["w"],
                               preferred_element_type=jnp.float32)
            ys.append(y)
        agg_list, rows_all = ops.fused_multiview_pv(atts, ys)
    elif hasattr(ops, "fused_multiview"):
        # tile/pallas: scores stay in VMEM (pallas) / are built per view
        agg_all, rows_all = ops.fused_multiview(atts, x)
        agg_list = [agg_all[v] for v in range(5)]
    elif hasattr(ops, "multi_aggregate"):
        sig_all = jnp.stack(
            [ops.scores(atts[v], VIEW_REL_COLUMNS[v])
             for v in range(5)], axis=-1)                    # [N, D, 5]
        agg_all = ops.multi_aggregate(sig_all, x)            # [N, 5, F]
        agg_list = [agg_all[:, v, :] for v in range(5)]
    xs, sigs, new_bstates = [], [], []
    for v in range(5):
        pre_agg = agg_list[v] if agg_list is not None else None
        pre_rows = rows_all[v] if rows_all is not None else None
        h, sig, bs = view_block_apply(
            blocks[v], state["blocks"][v], ops, batch, x,
            VIEW_REL_COLUMNS[v], drop_rate, train, rngs[v], axis_name,
            precomputed_agg=pre_agg,
            precomputed_sig=None if sig_all is None else sig_all[..., v],
            precomputed_rowsum=pre_rows,
            need_sig=last and need_consensus,
            pre_y=ys[v] if use_pre else None,
            bn_extra=bn_extra,
        )
        xs.append(h)
        sigs.append(sig)
        new_bstates.append(bs)

    conn = batch.node_conn
    act_dt = xs[0].dtype
    if structure == "Concate":
        fused = jnp.concatenate(xs, axis=-1) * conn[:, None].astype(act_dt)
    elif structure == "Weighted_sum":                          # :313-316
        fused = sum(params["ave"][v].astype(act_dt) * xs[v]
                    for v in range(5))
    else:
        raise ValueError(f"unknown structure {structure!r}")

    consensus = None
    if last and need_consensus:
        # consensus attention for pooling (`layers.py:318-324`): weighted
        # average of the five score maps, re-sigmoided, self-loop added,
        # row-normalized.  Kept in backend edge layout + per-node extras.
        ave = sum(params["ave_A"][v] * sigs[v] for v in range(5))
        a_cons = jax.nn.sigmoid(ave)
        # zero out padded slots (sigmoid(0)=0.5 on fake edges)
        a_cons = a_cons * _edge_presence(ops)
        sr = jax.nn.sigmoid(params["self_r"])
        denom = ops.rowsum(a_cons) + sr * conn + batch.node_tiny + (1 - conn)
        consensus = {"edge_w": a_cons, "self_w": sr, "denom": denom}
    return fused, consensus, {"blocks": new_bstates}


def _edge_presence(ops: GraphOps) -> jnp.ndarray:
    if hasattr(ops, "adj_f"):
        return ops.adj_f         # block-dense tile layout
    if hasattr(ops, "neigh_mask"):
        return ops.neigh_mask    # ELL-layout backends
    return ops.edge_mask         # COO layout


def consensus_aggregate(consensus, ops: GraphOps, batch, x) -> jnp.ndarray:
    """Applies the row-normalized consensus adjacency to features
    (A_weight @ x for the DiffPool path, `models.py:104-106`)."""
    conn = batch.node_conn
    sig = consensus["edge_w"]
    denom = consensus["denom"]
    sr = consensus["self_w"]
    agg = ops.aggregate(sig, x)
    h = (agg + (sr * conn)[:, None] * x) / denom[:, None] * conn[:, None]
    return h


# --------------------------------------------------------------------------
# dense / readout pieces  (Dense, layers.py:360-392)
# --------------------------------------------------------------------------

def init_dense(key, f_in: int, f_out: int, bias: bool = False):
    """torch-parity init: U(+-1/sqrt(OUT features)) — the reference uses
    `weight.size(1)` i.e. fan-OUT for the bound (`layers.py:376-380`)."""
    bound = 1.0 / math.sqrt(f_out)
    params = {"w": _uniform(key, (f_in, f_out), bound)}
    if bias:
        params["b"] = _uniform(jax.random.fold_in(key, 1), (f_out,), bound)
    return params


def dense_apply(params, x):
    y = x @ params["w"]
    if "b" in params:
        y = y + params["b"]
    return y


# --------------------------------------------------------------------------
# Vanilla GCN layer  (layers.py:205-258)
# --------------------------------------------------------------------------

def init_gcn_layer(key, f_in: int, f_out: int):
    k_w, k_b, k_bn = jax.random.split(key, 3)
    bn_params, bn_state = init_batch_norm(k_bn, f_out)
    params = {
        "w": 0.02 * jax.random.normal(k_w, (f_in, f_out), jnp.float32),
        "b": _uniform(k_b, (f_out,), 1.0 / math.sqrt(f_out)),
        "bn": bn_params,
    }
    return params, {"bn": bn_state}


def gcn_layer_apply(params, state, ops, batch, x, drop_rate, train, rng,
                    axis_name=None):
    """Kipf GCN with the reference's masking: A = adj + I*mask + tiny,
    row-normalized (`layers.py:237-253`)."""
    conn = batch.node_conn
    ones = _edge_presence(ops)
    denom = ops.rowsum(ones) + conn + batch.node_tiny + (1 - conn)
    agg = ops.aggregate(ones, x)
    h = (agg + conn[:, None] * x) / denom[:, None] * conn[:, None]
    h = h @ params["w"] + params["b"]
    h_bn, bn_state = batch_norm_apply(
        params["bn"], state["bn"], h, batch.node_mask, train, axis_name
    )
    h = jax.nn.relu(h_bn)
    h = dropout(h, drop_rate, rng, train)
    dt = getattr(ops, "compute_dtype", None)
    if dt is not None:
        h = h.astype(dt)
    return h, {"bn": bn_state}


# --------------------------------------------------------------------------
# GAT layer  (layers.py:99-200) — sparse softmax attention
# --------------------------------------------------------------------------

def init_gat_layer(key, f_in: int, f_out: int):
    """Xavier-uniform gain 1.414 (`layers.py:112-115`)."""
    k_w, k_a = jax.random.split(key)
    bw = 1.414 * math.sqrt(6.0 / (f_in + f_out))
    ba = 1.414 * math.sqrt(6.0 / (2 * f_out + 1))
    params = {
        "w": _uniform(k_w, (f_in, f_out), bw),
        "a_src": _uniform(k_a, (f_out,), ba),
        "a_dst": _uniform(jax.random.fold_in(k_a, 1), (f_out,), ba),
    }
    return params, {}


def gat_layer_apply(params, state, ops, batch, x, drop_rate, train, rng,
                    alpha: float = 0.2, axis_name=None):
    """Sparse GAT over A = adj + I (`layers.py:190`): attention
    e_ij = LeakyReLU(a^T [Wh_i || Wh_j]) decomposed into per-node halves,
    softmax over the in-neighborhood + self.  Replaces the reference's
    per-molecule Python loop (`layers.py:194-195`) with one vectorized
    mega-graph pass."""
    if not isinstance(ops, EllOps):
        raise NotImplementedError("GAT requires the ELL backend")
    h = x @ params["w"]                               # [N, F']
    e_src = h @ params["a_src"]                       # [N] a^T Wh_i (dst half)
    e_dst = h @ params["a_dst"]                       # [N] (src half)
    gathered_e = e_dst[ops.neigh]                     # [N, D]
    logits = jax.nn.leaky_relu(e_src[:, None] + gathered_e, alpha)
    self_logit = jax.nn.leaky_relu(e_src + e_dst, alpha)  # [N]
    neg = jnp.finfo(logits.dtype).min
    logits = jnp.where(ops.neigh_mask > 0, logits, neg)
    all_logits = jnp.concatenate([logits, self_logit[:, None]], axis=1)
    att = jax.nn.softmax(all_logits, axis=1)          # [N, D+1]
    att = att * jnp.concatenate(
        [ops.neigh_mask, batch.node_conn[:, None]], axis=1
    )
    if train and rng is not None:
        att = dropout(att, 0.5, rng, train)           # layers.py:134
    neigh_att, self_att = att[:, :-1], att[:, -1]
    # ops.aggregate routes through the scatter-free custom VJP
    out = ops.aggregate(neigh_att * ops.neigh_mask, h)
    out = out + self_att[:, None] * h
    rng2 = jax.random.fold_in(rng, 1) if rng is not None else None
    out = dropout(out, drop_rate, rng2, train)        # layers.py:197
    out = jax.nn.relu(out)                            # layers.py:198
    dt = getattr(ops, "compute_dtype", None)
    if dt is not None:
        out = out.astype(dt)
    return out, {}
