"""Data-parallel training over the ('data',) mesh axis.

Each device holds one self-contained packed mega-graph shard (molecules
never cross shards, node indices are shard-local — `pack_sharded`), the
parameters are replicated, gradients and BatchNorm moments are `psum`'d
over ICI.  Expressed with `shard_map` so the collective placement is
explicit and XLA can overlap the gradient all-reduce with the backward
pass."""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..data.batching import BatchShape, GraphBatch, GraphBatcher
from ..data.dataset import FeaturizedDataset
from ..utils.config import ModelConfig


def stack_batches(shards: Sequence[GraphBatch]) -> GraphBatch:
    """[per-shard GraphBatch] -> one GraphBatch with leading shard axis on
    every array (the layout `shard_map` with P('data') expects)."""
    return GraphBatch(**{
        f.name: np.stack([getattr(s, f.name) for s in shards])
        for f in dataclasses.fields(GraphBatch)
    })


def unstack_lead(batch: GraphBatch) -> GraphBatch:
    """Strips the leading (per-device, size-1 after shard_map) axis."""
    return GraphBatch(**{
        f.name: getattr(batch, f.name)[0]
        for f in dataclasses.fields(GraphBatch)
    })


def pack_sharded(
    ds: FeaturizedDataset,
    indices: np.ndarray,
    shape: BatchShape,
    n_shards: int,
) -> GraphBatch:
    """Packs an index list into `n_shards` equal-shape shard graphs,
    distributing molecules round-robin (size-balanced enough for molecular
    data).  `shape` is the PER-SHARD budget."""
    batcher = GraphBatcher(shape)
    per_shard: List[List[int]] = [[] for _ in range(n_shards)]
    for k, i in enumerate(indices):
        per_shard[k % n_shards].append(int(i))
    shards = []
    for ids in per_shard:
        graphs = [ds.graphs[i] for i in ids]
        labels = (
            np.stack([ds.labels[i] for i in ids])
            if ids else np.zeros((0, ds.labels.shape[1]), np.float32)
        )
        shards.append(batcher.pack(graphs, labels, ids))
    return stack_batches(shards)


def sharded_batch_stream(
    ds: FeaturizedDataset,
    indices: np.ndarray,
    shape: BatchShape,
    n_shards: int,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
):
    """Yields stacked sharded batches covering `indices`; the global batch
    is n_shards * shape.num_mols molecules."""
    order = np.array(indices, copy=True)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    global_mols = n_shards * shape.num_mols
    # conservative greedy chunking on the global stream: a chunk fits if
    # every shard's round-robin slice fits its node/edge budget
    start = 0
    n = len(order)
    while start < n:
        end = min(start + global_mols, n)
        while end > start:
            chunk = order[start:end]
            ok = True
            for s in range(n_shards):
                ids = chunk[s::n_shards]
                nodes = sum(ds.graphs[i].num_atoms for i in ids)
                edges = sum(2 * ds.graphs[i].num_bonds for i in ids)
                if (len(ids) > shape.num_mols or nodes > shape.num_nodes
                        or edges > shape.num_edges):
                    ok = False
                    break
            if ok:
                break
            end -= n_shards if end - n_shards > start else 1
        yield pack_sharded(ds, order[start:end], shape, n_shards)
        start = end


def make_dp_train_step(
    cfg: ModelConfig,
    task_type: str,
    tx,
    mesh: Mesh,
    class_weights=None,
    axes: Sequence[str] = ("data",),
) -> Callable:
    """shard_map'd + jitted train step sharding the batch's leading axis
    over `axes` (e.g. ('data',) for pure DP, ('data', 'graph') to spread
    molecule shards over the full 2D mesh).  Signature: (params, state,
    opt_state, stacked_batch, rng) -> (params, state, opt_state, loss);
    params/state/opt are replicated, gradients and BN moments psum over
    `axes`."""
    from ..train.steps import make_train_step

    axes = tuple(axes)
    inner = make_train_step(
        cfg, task_type, tx, class_weights, axis_name=axes
    )

    def per_device(params, state, opt_state, batch, rng):
        local = unstack_lead(batch)
        # decorrelate dropout across shards
        for ax in axes:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(ax))
        params, state, opt_state, loss = inner(
            params, state, opt_state, local, rng
        )
        return params, state, opt_state, loss

    smapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axes), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0, 1, 2))


def make_dp_eval_step(cfg: ModelConfig, task_type: str, mesh: Mesh):
    """Sharded eval: every device evaluates its shard; outputs stay sharded
    on the leading axis (host gathers via addressable shards)."""
    from ..models import apply_eagcn

    def per_device(params, state, batch):
        local = unstack_lead(batch)
        logits, atoms, graphs, _ = apply_eagcn(
            params, state, local, cfg, train=False
        )
        preds = jax.nn.sigmoid(logits) if task_type == "class" else logits
        return preds[None], local.labels[None], local.mol_mask[None]

    smapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(smapped)
