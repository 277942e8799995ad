"""Data-pipeline tests: featurization caching, splits, class weights,
batching invariants, normalization."""

import numpy as np
import pytest

from eagcn_tpu.data import (
    BatchShape,
    bce_class_weights,
    get_spec,
    iter_batches,
    load_dataset,
    plan_batch_shape,
    train_val_test_split,
)
from eagcn_tpu.data.dataset import featurize_dataset, load_cache, save_cache, _cache_key


@pytest.fixture(scope="module")
def freesolv():
    return load_dataset(get_spec("freesolv"))


class TestFeaturization:
    def test_row_filter_counts(self, freesolv):
        # SAMPL.csv: 642 molecules, 3 single-atom rows (no bonds)
        assert len(freesolv) == 639
        assert freesolv.skip_stats.get("GraphError", 0) == 3

    def test_normalization_global_minmax(self, freesolv):
        all_feats = np.concatenate([g.atom_features for g in freesolv.graphs])
        assert all_feats.min() >= 0.0 and all_feats.max() <= 1.0
        # at least one feature column spans the full range
        assert (all_feats.max(0) == 1.0).any()

    def test_bondtype_order_is_frequency_desc(self, freesolv):
        # most frequent bond type in organic molecules is carbon-carbon
        assert freesolv.bondtype_list[0] == "6_6"

    def test_cache_roundtrip(self, freesolv, tmp_path):
        key = "t"
        save_cache(freesolv, str(tmp_path), key)
        ds2 = load_cache(freesolv.spec, str(tmp_path), key)
        assert ds2 is not None and len(ds2) == len(freesolv)
        np.testing.assert_array_equal(ds2.labels, freesolv.labels)
        np.testing.assert_array_equal(
            ds2.graphs[5].atom_features, freesolv.graphs[5].atom_features)
        np.testing.assert_array_equal(
            ds2.graphs[5].bond_relations, freesolv.graphs[5].bond_relations)
        assert ds2.bondtype_list == freesolv.bondtype_list

    def test_native_equals_python_pipeline(self):
        a = featurize_dataset(get_spec("freesolv"), use_native=True)
        b = featurize_dataset(get_spec("freesolv"), use_native=False)
        assert len(a) == len(b)
        assert a.bondtype_list == b.bondtype_list
        for ga, gb in zip(a.graphs[::37], b.graphs[::37]):
            np.testing.assert_array_equal(ga.atom_features, gb.atom_features)
            np.testing.assert_array_equal(ga.bond_relations, gb.bond_relations)


class TestSplits:
    def test_sklearn_parity(self, freesolv):
        tr, va, te = train_val_test_split(len(freesolv), 0)
        assert len(tr) == 511 and len(va) == 64 and len(te) == 64
        assert len(set(tr) | set(va) | set(te)) == 639
        # deterministic
        tr2, _, _ = train_val_test_split(len(freesolv), 0)
        np.testing.assert_array_equal(tr, tr2)
        tr3, _, _ = train_val_test_split(len(freesolv), 7)
        assert not np.array_equal(tr, tr3)

    def test_class_weights(self):
        y = np.array([[1, 0], [1, -1], [0, 1], [0, -1]], np.float32)
        w = bce_class_weights(y)
        assert w.shape == (2, 2)
        assert w[0, 0] == 5000.0 / 2 and w[0, 1] == 5000.0 / 2
        assert w[1, 0] == 5000.0 / 1 and w[1, 1] == 5000.0 / 1


class TestBatching:
    def test_all_molecules_covered_once(self, freesolv):
        shape = plan_batch_shape(
            freesolv.sizes(),
            np.array([g.num_bonds for g in freesolv.graphs]), 32)
        seen = []
        for b in iter_batches(freesolv, np.arange(len(freesolv)), shape):
            seen.extend(b.mol_index[b.mol_mask > 0].tolist())
        assert sorted(seen) == list(range(len(freesolv)))

    def test_ell_coo_consistency(self, freesolv):
        shape = BatchShape(num_nodes=256, num_edges=512, num_mols=16)
        b = next(iter_batches(freesolv, np.arange(16), shape))
        # per-node degree from ELL equals in-degree from COO
        ell_deg = b.neigh_mask.sum(1)
        coo_deg = np.zeros_like(ell_deg)
        for dst, m in zip(b.edge_dst, b.edge_mask):
            if m > 0:
                coo_deg[dst] += 1
        np.testing.assert_array_equal(ell_deg, coo_deg)
        # reverse-slot invariant: neigh[neigh[j,d], rev[j,d]] == j
        for j in range(b.num_nodes):
            for d in range(b.max_degree):
                if b.neigh_mask[j, d] > 0:
                    assert b.neigh[b.neigh[j, d], b.neigh_rev[j, d]] == j

    def test_tiny_mass(self, freesolv):
        shape = BatchShape(num_nodes=128, num_edges=256, num_mols=4)
        b = next(iter_batches(freesolv, np.arange(4), shape))
        for j in range(b.num_nodes):
            if b.node_mask[j] > 0:
                n_mol = int(b.mol_size[b.node_mol[j]])
                deg = int(b.neigh_mask[j].sum())
                assert abs(b.node_tiny[j] - (n_mol - deg) * 1e-9) < 1e-15


class TestGiantPacker:
    """pack_single_giant (vectorized) vs GraphBatcher.pack (sequential) on
    the same giant graph: same aggregation semantics, consistent rev slots."""

    def test_pack_single_giant_matches_sequential(self):
        from eagcn_tpu.data.batching import (
            BatchShape, GraphBatcher, pack_single_giant,
        )
        from eagcn_tpu.data.synthetic import giant_graph

        g = giant_graph(3, 3000, avg_degree=4.0, n_bond_types=12,
                        max_degree=8, span=256)
        shape = BatchShape(num_nodes=3072, num_edges=2 * g.num_bonds + 64,
                           num_mols=1, max_degree=8)
        lab = np.asarray([[0.5]], np.float32)
        a = GraphBatcher(shape).pack([g], lab, [0])
        b = pack_single_giant(g, shape, label=lab[0])

        np.testing.assert_array_equal(a.node_feat, b.node_feat)
        np.testing.assert_array_equal(a.node_mol, b.node_mol)
        np.testing.assert_array_equal(a.node_conn, b.node_conn)
        np.testing.assert_allclose(a.node_tiny, b.node_tiny, rtol=0, atol=0)
        np.testing.assert_array_equal(a.labels, b.labels)
        # per-row neighbour SETS match (slot order may differ)
        n = g.num_atoms
        for i in range(0, n, 97):
            d = int(a.neigh_mask[i].sum())
            assert d == int(b.neigh_mask[i].sum())
            sa = sorted(zip(a.neigh[i, :d].tolist(),
                            a.neigh_rel[i, :d, 0].tolist()))
            sb = sorted(zip(b.neigh[i, :d].tolist(),
                            b.neigh_rel[i, :d, 0].tolist()))
            assert sa == sb
        # rev-slot invariant: neigh[neigh[j,s], rev[j,s]] == j on real slots
        jj, ss = np.nonzero(b.neigh_mask)
        src = b.neigh[jj, ss]
        assert np.array_equal(b.neigh[src, b.neigh_rev[jj, ss]], jj)
        # identical aggregation through the ELL backend
        import jax
        import jax.numpy as jnp
        from eagcn_tpu.ops.aggregate import make_ops

        x = np.random.default_rng(0).normal(
            size=(shape.num_nodes, 8)).astype(np.float32)
        outs = []
        for batch in (a, b):
            ops = make_ops(batch, "ell", n_rels=(12, 4, 2, 2, 2))
            w = ops.scores(jnp.linspace(-1, 1, 12), 0)
            outs.append(np.asarray(ops.aggregate(w, jnp.asarray(x))))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)
