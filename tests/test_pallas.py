"""Fused multi-view tile kernel (ops/pallas_tile.py) vs the XLA tile
backend: forward, rowsums, and gradients must agree to fp32 noise.

On CPU the kernel runs in Pallas interpret mode (same kernel code path);
on TPU hardware the compiled kernel is exercised by bench.py (pallas is
the default bench backend) and by CLI training with --backend pallas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eagcn_tpu.data.batching import BatchShape, GraphBatcher, batch_to_jax
from eagcn_tpu.data.synthetic import random_molecule_set
from eagcn_tpu.models import apply_eagcn, init_eagcn
from eagcn_tpu.ops.aggregate import TileOps
from eagcn_tpu.ops.pallas_tile import PallasTileOps
from eagcn_tpu.utils.config import ModelConfig

S = 32
N_BOND = 7
N_RELS = (N_BOND, 4, 2, 2, 2)


def make_batch(n_mols=24, seed=0):
    graphs, labels = random_molecule_set(
        seed, n_mols, mean_atoms=11.0, n_bond_types=N_BOND, n_tasks=2
    )
    nodes = sum(g.num_atoms for g in graphs)
    shape = BatchShape(
        num_nodes=((nodes * 2 + S) // S) * S,
        num_edges=sum(2 * g.num_bonds for g in graphs) + 64,
        num_mols=n_mols,
        tile_size=S,
    )
    return batch_to_jax(GraphBatcher(shape).pack(
        graphs, labels, list(range(n_mols))))


def make_ops_pair(batch):
    n = batch.node_feat.shape[0]
    kw = dict(neigh_rel=batch.neigh_rel, neigh_mask=batch.neigh_mask)
    xla = TileOps(batch.tile_adj, batch.tile_rel, n, **kw)
    pal = PallasTileOps(batch.tile_adj, batch.tile_rel, n,
                        interpret=True, **kw)
    return xla, pal


def make_atts(key):
    ks = jax.random.split(key, 5)
    return [jax.random.normal(ks[v], (N_RELS[v],), jnp.float32)
            for v in range(5)]


class TestFusedKernel:
    def test_forward_matches_xla_tile(self):
        batch = make_batch()
        n = batch.node_feat.shape[0]
        x = jax.random.normal(jax.random.key(1), (n, 24), jnp.float32)
        atts = make_atts(jax.random.key(2))

        xla, pal = make_ops_pair(batch)
        agg, rows = pal.fused_multiview(atts, x)
        for v in range(5):
            sig = xla.scores(atts[v], v)
            np.testing.assert_allclose(
                rows[v], xla.rowsum(sig), rtol=1e-6, atol=1e-6,
                err_msg=f"rowsum view {v}")
            np.testing.assert_allclose(
                agg[v], xla.aggregate(sig, x), rtol=1e-5, atol=1e-5,
                err_msg=f"agg view {v}")

    def test_grad_matches_xla_tile(self):
        batch = make_batch()
        n = batch.node_feat.shape[0]
        x = jax.random.normal(jax.random.key(3), (n, 40), jnp.float32)
        atts = make_atts(jax.random.key(4))
        xla, pal = make_ops_pair(batch)
        # scalar loss touching both outputs, with per-view weighting so
        # gradient symmetry bugs can't cancel
        wv = jnp.asarray([1.0, -0.5, 2.0, 0.25, -1.5])

        def loss_pal(atts, x):
            agg, rows = pal.fused_multiview(atts, x)
            return jnp.sum(wv[:, None, None] * jnp.sin(agg)) + jnp.sum(
                wv[:, None] * rows ** 2)

        def loss_xla(atts, x):
            tot = 0.0
            for v in range(5):
                sig = xla.scores(atts[v], v)
                tot += wv[v] * jnp.sum(jnp.sin(xla.aggregate(sig, x)))
                tot += wv[v] * jnp.sum(xla.rowsum(sig) ** 2)
            return tot

        (lp, gp) = jax.value_and_grad(loss_pal, argnums=(0, 1))(atts, x)
        (lx, gx) = jax.value_and_grad(loss_xla, argnums=(0, 1))(atts, x)
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
        for v in range(5):
            np.testing.assert_allclose(gp[0][v], gx[0][v], rtol=1e-4,
                                       atol=1e-5, err_msg=f"datt view {v}")
        np.testing.assert_allclose(gp[1], gx[1], rtol=1e-4, atol=1e-5,
                                   err_msg="dx")

    def test_per_view_features_match_xla(self):
        """The narrow-side (pre-transform) variant: per-view feature sets,
        including ragged widths that exercise the pad/slice."""
        batch = make_batch(n_mols=12, seed=7)
        n = batch.node_feat.shape[0]
        widths = (24, 16, 16, 8, 24)
        ys = [jax.random.normal(jax.random.key(10 + v), (n, widths[v]),
                                jnp.float32) for v in range(5)]
        atts = make_atts(jax.random.key(11))
        xla, pal = make_ops_pair(batch)

        def loss(ops_obj, atts, ys):
            aggs, rows = ops_obj.fused_multiview_pv(atts, ys)
            return sum(jnp.sum(jnp.sin(a)) for a in aggs) + jnp.sum(rows ** 2)

        (lp, gp) = jax.value_and_grad(
            lambda a, y: loss(pal, a, y), argnums=(0, 1))(atts, ys)
        (lx, gx) = jax.value_and_grad(
            lambda a, y: loss(xla, a, y), argnums=(0, 1))(atts, ys)
        np.testing.assert_allclose(float(lp), float(lx), rtol=1e-5)
        for v in range(5):
            np.testing.assert_allclose(gp[0][v], gx[0][v], rtol=1e-4,
                                       atol=1e-5, err_msg=f"datt view {v}")
            np.testing.assert_allclose(gp[1][v], gx[1][v], rtol=1e-4,
                                       atol=1e-5, err_msg=f"dy view {v}")

    def test_feature_padding(self):
        """F not a multiple of the feature tile exercises the pad/slice."""
        batch = make_batch(n_mols=6, seed=5)
        n = batch.node_feat.shape[0]
        for f in (3, 129):
            x = jax.random.normal(jax.random.key(f), (n, f), jnp.float32)
            atts = make_atts(jax.random.key(6))
            xla, pal = make_ops_pair(batch)
            agg, _ = pal.fused_multiview(atts, x)
            assert agg.shape == (5, n, f)
            np.testing.assert_allclose(
                agg[2], xla.aggregate(xla.scores(atts[2], 2), x),
                rtol=1e-5, atol=1e-5)


class TestPallasModel:
    @pytest.mark.parametrize("structure", ["Concate", "Weighted_sum"])
    def test_model_forward_and_grad_match_tile(self, structure):
        batch = make_batch()
        cfg = dict(
            n_bfeat=N_BOND, sgc1=(5, 4, 3, 4, 5), sgc2=(6, 5, 4, 5, 6),
            n_den1=12, n_den2=8, n_tasks=2, dropout=0.0, structure=structure,
        )
        cfg_t = ModelConfig(backend="tile", **cfg)
        cfg_p = ModelConfig(backend="pallas", **cfg)
        params, state = init_eagcn(jax.random.key(0), cfg_t)

        def loss(p, c):
            logits, _, _, _ = apply_eagcn(p, state, batch, c, train=True)
            return jnp.sum(logits ** 2), logits

        (l_t, o_t), g_t = jax.value_and_grad(loss, has_aux=True)(
            params, cfg_t)
        (l_p, o_p), g_p = jax.value_and_grad(loss, has_aux=True)(
            params, cfg_p)
        np.testing.assert_allclose(o_p, o_t, rtol=2e-5, atol=2e-5)
        vec_p = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_p)])
        vec_t = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_t)])
        rel = np.linalg.norm(vec_p - vec_t) / np.linalg.norm(vec_t)
        assert rel < 1e-4, f"grad rel-L2 {rel}"

    def test_pre_transform_matches_direct_order(self):
        """A@(XW) == (A@X)@W up to float reordering — the rewrite must not
        change the model function."""
        batch = make_batch()
        cfg = dict(
            n_bfeat=N_BOND, sgc1=(8, 8, 8, 8, 8), sgc2=(4, 4, 4, 4, 4),
            n_den1=12, n_den2=8, n_tasks=2, dropout=0.0,
            structure="Concate", backend="tile",
        )
        cfg_pre = ModelConfig(pre_transform=True, **cfg)
        cfg_dir = ModelConfig(pre_transform=False, **cfg)
        params, state = init_eagcn(jax.random.key(1), cfg_pre)

        def loss(p, c):
            logits, _, _, _ = apply_eagcn(p, state, batch, c, train=True)
            return jnp.sum(logits ** 2), logits

        (_, o_a), g_a = jax.value_and_grad(loss, has_aux=True)(
            params, cfg_pre)
        (_, o_b), g_b = jax.value_and_grad(loss, has_aux=True)(
            params, cfg_dir)
        # float reassociation compounds through 4 BN layers: loose-ish tols
        np.testing.assert_allclose(o_a, o_b, rtol=5e-3, atol=5e-5)
        va = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_a)])
        vb = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g_b)])
        rel = np.linalg.norm(va - vb) / np.linalg.norm(vb)
        assert rel < 5e-3, f"grad rel-L2 {rel}"

    def test_diffpool_consensus_path(self):
        """molfp=pool forces the consensus branch, which recomputes scores
        via the XLA fallback inside the pallas backend."""
        batch = make_batch()
        cfg = dict(
            n_bfeat=N_BOND, sgc1=(4,) * 5, sgc2=(5,) * 5,
            n_den1=8, n_den2=8, n_tasks=1, dropout=0.0,
            structure="Concate", molfp_mode="pool",
        )
        p, s = init_eagcn(jax.random.key(2), ModelConfig(backend="tile", **cfg))
        o_t, _, _, _ = apply_eagcn(p, s, batch, ModelConfig(backend="tile", **cfg))
        o_p, _, _, _ = apply_eagcn(p, s, batch, ModelConfig(backend="pallas", **cfg))
        np.testing.assert_allclose(o_p, o_t, rtol=5e-5, atol=5e-5)
