"""bf16 compute path: activations and aggregation inputs are stored at
half width through the graph layers (HBM-bandwidth lever on TPU) while
matmul/BN accumulation stays fp32.  Asserts the mode tracks the fp32 path
closely and trains."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagcn_tpu.data.batching import BatchShape, GraphBatcher, batch_to_jax
from eagcn_tpu.data.synthetic import random_molecule_set
from eagcn_tpu.models import apply_eagcn, init_eagcn
from eagcn_tpu.utils.config import benchmark_config


def _setup(structure="Concate"):
    cfg = benchmark_config("tox21", structure=structure)
    cfg.model.n_bfeat = 8
    cfg.model.dropout = 0.0
    graphs, labels = random_molecule_set(
        0, 16, mean_atoms=12.0, n_bond_types=8, n_tasks=cfg.model.n_tasks)
    labels = (labels > 0).astype(np.float32)
    shape = BatchShape(num_nodes=256, num_edges=512, num_mols=16)
    batch = batch_to_jax(GraphBatcher(shape).pack(graphs, labels, list(range(16))))
    params, state = init_eagcn(jax.random.key(0), cfg.model)
    return cfg, params, state, batch


@pytest.mark.parametrize("structure", ["Concate", "Weighted_sum", "GCN", "GAT"])
def test_forward_close_to_fp32(structure):
    cfg, params, state, batch = _setup(structure)
    logits32, reps32, _, _ = apply_eagcn(params, state, batch, cfg.model,
                                         train=False)
    cfg16 = dataclasses.replace(cfg.model, bf16=True)
    logits16, reps16, _, _ = apply_eagcn(params, state, batch, cfg16,
                                         train=False)
    assert logits16.dtype == jnp.float32          # head stays fp32
    assert reps16.dtype == jnp.float32
    scale = np.maximum(np.abs(np.asarray(logits32)), 1e-2)
    rel = np.abs(np.asarray(logits16) - np.asarray(logits32)) / scale
    assert np.median(rel) < 0.05, np.median(rel)


def test_grads_finite_and_match_sign():
    cfg, params, state, batch = _setup()
    cfg16 = dataclasses.replace(cfg.model, bf16=True)

    def loss(p, mcfg):
        logits, _, _, _ = apply_eagcn(p, state, batch, mcfg, train=True,
                                      rng=jax.random.key(1))
        return jnp.sum(jnp.where(batch.mol_mask[:, None] > 0, logits, 0.0) ** 2)

    g32 = jax.grad(loss)(params, cfg.model)
    g16 = jax.grad(loss)(params, cfg16)
    flat32 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g32)])
    flat16 = jnp.concatenate([x.astype(jnp.float32).ravel()
                              for x in jax.tree.leaves(g16)])
    assert bool(jnp.all(jnp.isfinite(flat16)))
    # gradients point the same way overall
    cos = jnp.vdot(flat32, flat16) / (
        jnp.linalg.norm(flat32) * jnp.linalg.norm(flat16) + 1e-12)
    # backward matmuls run with bf16 cotangents (ops/matmul.py) — the MXU
    # rate win costs a little gradient fidelity; convergence is asserted
    # end-to-end by test_bf16_train_step_runs and the benchmark runs
    assert float(cos) > 0.96, float(cos)


def test_bf16_train_step_runs():
    from eagcn_tpu.train import make_optimizer, make_train_step

    cfg, params, state, batch = _setup()
    cfg16 = dataclasses.replace(cfg.model, bf16=True)
    tx = make_optimizer(1e-3, 0.0)
    opt_state = tx.init(params)
    cw = np.ones((cfg.model.n_tasks, 2), np.float32)
    step = make_train_step(cfg16, "class", tx, cw)
    rng = jax.random.key(2)
    losses = []
    for i in range(4):
        params, state, opt_state, loss = step(params, state, opt_state,
                                              batch, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
