"""Giant-graph chunked path (ops/giant.py) vs molecule-scale ELL backend:
forward and gradient parity on the same graph, plus the symmetric-A
assumption that powers its scatter-free backward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagcn_tpu.data.batching import BatchShape, GraphBatcher, batch_to_jax
from eagcn_tpu.data.synthetic import giant_graph
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.models.eagcn import apply_eagcn
from eagcn_tpu.ops.giant import GiantBatch, giant_batch_from_graph
from eagcn_tpu.utils.config import ModelConfig


def _setup(n_nodes=3000, chunk_target=512, widths=(8, 8)):
    g = giant_graph(11, n_nodes, avg_degree=4.0, n_bond_types=12,
                    max_degree=8, span=256)
    cfg = ModelConfig(n_bfeat=12, sgc1=(widths[0],) * 5,
                      sgc2=(widths[1],) * 5, n_den1=16, n_den2=8,
                      n_tasks=1, dropout=0.0, structure="Concate",
                      backend="ell")
    gb = jax.tree_util.tree_map(
        jnp.asarray, giant_batch_from_graph(g, label=[0.7],
                                            chunk_target=chunk_target))
    shape = BatchShape(num_nodes=gb.num_nodes,
                       num_edges=2 * g.num_bonds + 64, num_mols=1,
                       max_degree=8)
    eb = batch_to_jax(GraphBatcher(shape).pack(
        [g], np.asarray([[0.7]], np.float32), [0]))
    params, state = init_eagcn(jax.random.key(0), cfg)
    return cfg, gb, eb, params, state


class TestGiantPath:
    def test_forward_parity(self):
        cfg, gb, eb, params, state = _setup()
        out_g = apply_eagcn(params, state, gb, cfg, train=False)[0]
        out_e = apply_eagcn(params, state, eb, cfg, train=False)[0]
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_e),
                                   rtol=1e-4, atol=1e-4)

    def test_forward_parity_wide_layer1(self):
        # layer1 wider than the 24-dim input -> exercises the shared-x
        # fused_multiview (tiled) path on the giant backend
        cfg, gb, eb, params, state = _setup(widths=(32, 8))
        out_g = apply_eagcn(params, state, gb, cfg, train=False)[0]
        out_e = apply_eagcn(params, state, eb, cfg, train=False)[0]
        np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_e),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_parity(self):
        cfg, gb, eb, params, state = _setup()

        def loss(p, batch):
            logits, _, _, _ = apply_eagcn(p, state, batch, cfg, train=True,
                                          rng=jax.random.key(3))
            return jnp.sum((logits - batch.labels) ** 2)

        g_g = jax.grad(loss)(params, gb)
        g_e = jax.grad(loss)(params, eb)
        va = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_g)])
        vb = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_e)])
        rel = np.linalg.norm(va - vb) / (np.linalg.norm(vb) + 1e-12)
        assert rel < 5e-3, rel
        # attention-dictionary grads specifically (the chunked histogram)
        for li in range(4):
            for v in range(5):
                a = np.asarray(g_g["layers"][li]["blocks"][v]["att"])
                b = np.asarray(g_e["layers"][li]["blocks"][v]["att"])
                np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    def test_chunking_invariance(self):
        # same graph, different chunk counts -> identical results
        cfg, gb1, _, params, state = _setup(chunk_target=512)
        _, gb2, _, _, _ = _setup(chunk_target=4096)
        out1 = apply_eagcn(params, state, gb1, cfg, train=False)[0]
        out2 = apply_eagcn(params, state, gb2, cfg, train=False)[0]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_runs(self):
        cfg, gb, _, params, state = _setup()
        cfg = dataclasses.replace(cfg, bf16=True, remat=True)
        out = apply_eagcn(params, state, gb, cfg, train=False)[0]
        assert np.isfinite(np.asarray(out)).all()
