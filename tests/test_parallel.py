"""Distributed-path tests on the forced 8-device CPU mesh (SURVEY §4 #4):
data-parallel training must match single-device training on the same global
batch (same loss, same updated params)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagcn_tpu.data import BatchShape, batch_to_jax, get_spec, load_dataset
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.parallel import (
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    pack_sharded,
    stack_batches,
)
from eagcn_tpu.train import make_optimizer, make_train_step
from eagcn_tpu.utils import benchmark_config
from eagcn_tpu.data.batching import GraphBatcher


@pytest.fixture(scope="module")
def freesolv():
    return load_dataset(get_spec("freesolv"))


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device(freesolv):
    ds = freesolv
    cfg = benchmark_config("freesolv")
    cfg.model.n_bfeat = ds.n_bfeat
    cfg.model.dropout = 0.0          # deterministic comparison
    n_shards = 4
    shard_shape = BatchShape(num_nodes=128, num_edges=256, num_mols=8)
    idx = np.arange(32)
    stacked = pack_sharded(ds, idx, shard_shape, n_shards)

    # plain SGD so parameter deltas are proportional to gradients (Adam's
    # first step is ~lr*sign(g), which amplifies fp32 reduction-order noise
    # on near-zero gradients into full-magnitude sign flips)
    import optax
    tx = optax.sgd(1e-2)
    params, state = init_eagcn(jax.random.key(0), cfg.model)
    opt_state = tx.init(params)

    mesh = make_mesh(data=n_shards, graph=1)
    dp_step = make_dp_train_step(cfg.model, "reg", tx, mesh)
    p_dp, s_dp, o_dp, loss_dp = dp_step(
        params, state, opt_state, batch_to_jax(stacked), jax.random.key(1)
    )

    # single-device equivalent: pack the SAME molecules as one graph
    big_shape = BatchShape(num_nodes=512, num_edges=1024, num_mols=32)
    # order must match shard round-robin concatenation for identical BN/loss
    order = np.concatenate([idx[s::n_shards] for s in range(n_shards)])
    batcher = GraphBatcher(big_shape)
    single = batcher.pack(
        [ds.graphs[i] for i in order],
        np.stack([ds.labels[i] for i in order]),
        list(order),
    )
    params2, state2 = init_eagcn(jax.random.key(0), cfg.model)
    opt2 = tx.init(params2)
    step = make_train_step(cfg.model, "reg", tx)
    p_1, s_1, o_1, loss_1 = step(
        params2, state2, opt2, batch_to_jax(single), jax.random.key(9)
    )

    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=2e-5)
    # parameters after one step must match (grads psum'd == global grads)
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_1 = jax.tree_util.tree_leaves(p_1)
    for a, b in zip(flat_dp, flat_1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    # BN running stats identical too (moments psum'd)
    for a, b in zip(jax.tree_util.tree_leaves(s_dp),
                    jax.tree_util.tree_leaves(s_1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_dp_eval_step(freesolv):
    ds = freesolv
    cfg = benchmark_config("freesolv")
    cfg.model.n_bfeat = ds.n_bfeat
    n_shards = 8
    shard_shape = BatchShape(num_nodes=128, num_edges=256, num_mols=4)
    stacked = pack_sharded(ds, np.arange(32), shard_shape, n_shards)
    params, state = init_eagcn(jax.random.key(0), cfg.model)
    mesh = make_mesh(data=n_shards, graph=1)
    ev = make_dp_eval_step(cfg.model, "reg", mesh)
    preds, labels, mask = ev(params, state, batch_to_jax(stacked))
    assert preds.shape == (n_shards, 4, 1)
    assert float(jnp.sum(mask)) == 32.0
