"""Golden-parity tests: sparse packed JAX model vs dense numpy oracle.

The oracle (tests/oracle.py) independently implements the reference math on
per-molecule dense tensors; these tests assert the jitted sparse mega-graph
path reproduces it through all four layers, both fusion structures, both BN
modes, and both aggregation backends (SURVEY.md §4 strategy #1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagcn_tpu.data import (
    BatchShape,
    batch_to_jax,
    get_spec,
    iter_batches,
    load_dataset,
)
from eagcn_tpu.models import apply_eagcn, init_eagcn
from eagcn_tpu.utils import benchmark_config

from oracle import dense_mol, np_params, oracle_forward


@pytest.fixture(scope="module")
def freesolv():
    return load_dataset(get_spec("freesolv"))


def _make_batch(ds, n_mols=8, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(ds), size=n_mols, replace=False)
    shape = BatchShape(num_nodes=256, num_edges=512, num_mols=n_mols)
    batch = next(iter_batches(ds, idx, shape))
    mols = [dense_mol(ds.graphs[int(i)], ds.n_bfeat) for i in idx]
    return batch, mols, idx


def _run_pair(ds, structure, train, backend="ell", molfp="sum", tol=2e-4):
    cfg = benchmark_config("freesolv", structure=structure)
    cfg.model.n_bfeat = ds.n_bfeat
    cfg.model.dropout = 0.0        # rng-free comparison
    cfg.model.backend = backend
    cfg.model.molfp_mode = molfp
    batch, mols, _ = _make_batch(ds)
    params, state = init_eagcn(jax.random.key(42), cfg.model)

    fwd = jax.jit(
        lambda p, s, b: apply_eagcn(p, s, b, cfg.model, train=train,
                                    rng=jax.random.key(0) if train else None)
    )
    logits, atom_reps, graph_rep, _ = fwd(params, state, batch_to_jax(batch))

    o_logits, o_atoms, o_graph = oracle_forward(
        np_params(params), np_params(state), mols, cfg.model, train=train
    )
    np.testing.assert_allclose(
        np.asarray(logits), o_logits, rtol=tol, atol=tol,
        err_msg=f"logits mismatch ({structure}, train={train})",
    )
    np.testing.assert_allclose(
        np.asarray(graph_rep), o_graph, rtol=tol, atol=tol
    )
    # per-atom representations: compare the packed rows molecule by molecule
    off = 0
    atom_np = np.asarray(atom_reps)
    for i, om in enumerate(o_atoms):
        n = om.shape[0]
        np.testing.assert_allclose(
            atom_np[off:off + n], om, rtol=tol, atol=tol,
            err_msg=f"atom reps mismatch mol {i}",
        )
        off += n


class TestForwardParity:
    def test_concat_eval(self, freesolv):
        _run_pair(freesolv, "Concate", train=False)

    def test_concat_train_stats(self, freesolv):
        _run_pair(freesolv, "Concate", train=True)

    def test_weighted_sum_eval(self, freesolv):
        _run_pair(freesolv, "Weighted_sum", train=False)

    def test_weighted_sum_train_stats(self, freesolv):
        _run_pair(freesolv, "Weighted_sum", train=True)

    def test_coo_backend_matches(self, freesolv):
        _run_pair(freesolv, "Concate", train=False, backend="coo")

    def test_molfp_ave(self, freesolv):
        _run_pair(freesolv, "Concate", train=False, molfp="ave")

    def test_molfp_pool(self, freesolv):
        _run_pair(freesolv, "Concate", train=False, molfp="pool")


class TestBackendsAgree:
    def test_ell_vs_coo_exact(self, freesolv):
        cfg = benchmark_config("freesolv")
        cfg.model.n_bfeat = freesolv.n_bfeat
        cfg.model.dropout = 0.0
        batch, _, _ = _make_batch(freesolv, n_mols=16, seed=3)
        jb = batch_to_jax(batch)
        params, state = init_eagcn(jax.random.key(7), cfg.model)
        outs = {}
        for backend in ("ell", "coo"):
            cfg.model.backend = backend
            fwd = jax.jit(lambda p, s, b: apply_eagcn(p, s, b, cfg.model)[0])
            outs[backend] = np.asarray(fwd(params, state, jb))
        np.testing.assert_allclose(outs["ell"], outs["coo"], rtol=1e-5, atol=1e-5)


class TestPackingInvariance:
    def test_batch_shape_invariance(self, freesolv):
        """Same molecules, different padding budgets -> identical logits
        (the reference's outputs depend on batch-max padding via BN; ours
        must not)."""
        cfg = benchmark_config("freesolv")
        cfg.model.n_bfeat = freesolv.n_bfeat
        cfg.model.dropout = 0.0
        params, state = init_eagcn(jax.random.key(0), cfg.model)
        idx = np.arange(8)
        outs = []
        for nn, ne in ((128, 256), (384, 640)):
            shape = BatchShape(num_nodes=nn, num_edges=ne, num_mols=8)
            b = next(iter_batches(freesolv, idx, shape))
            fwd = jax.jit(lambda p, s, bb: apply_eagcn(p, s, bb, cfg.model)[0])
            outs.append(np.asarray(fwd(params, state, batch_to_jax(b))))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)


def test_ell_pre_transform_parity():
    """EllOps.fused_multiview_pv (narrow-side rewrite) must match the
    shared-x ELL path: (A@X)@W == A@(X@W) with per-node row-norm."""
    import jax
    import numpy as np
    from eagcn_tpu.data.batching import BatchShape, GraphBatcher, batch_to_jax
    from eagcn_tpu.data.synthetic import random_molecule_set
    from eagcn_tpu.models import init_eagcn
    from eagcn_tpu.models.eagcn import apply_eagcn
    from eagcn_tpu.utils.config import ModelConfig

    graphs, labels = random_molecule_set(7, 24, n_bond_types=12, n_tasks=2)
    shape = BatchShape(num_nodes=896, num_edges=1792, num_mols=24)
    batch = batch_to_jax(GraphBatcher(shape).pack(graphs, labels,
                                                  list(range(24))))
    # narrow layers (f_out < f_in after layer 1) so the rewrite engages
    cfg = ModelConfig(n_bfeat=12, sgc1=(8,) * 5, sgc2=(8,) * 5,
                      n_den1=16, n_den2=8, n_tasks=2, dropout=0.0,
                      structure="Concate", backend="ell")
    params, state = init_eagcn(jax.random.key(0), cfg)
    out_pre = apply_eagcn(params, state, batch, cfg, train=False)[0]
    import dataclasses
    cfg_no = dataclasses.replace(cfg, pre_transform=False)
    out_no = apply_eagcn(params, state, batch, cfg_no, train=False)[0]
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_no),
                               rtol=2e-4, atol=2e-4)
