"""Ring-ppermute halo exchange == all-gather halo exchange == single device."""

import numpy as np

import jax
import jax.numpy as jnp

from eagcn_tpu.data.synthetic import giant_graph
from eagcn_tpu.parallel.edge_partition import (
    make_partitioned_spmm,
    make_ring_spmm,
    partition_giant_graph,
    partition_giant_graph_ring,
)
from eagcn_tpu.parallel.mesh import make_mesh


def test_ring_matches_allgather():
    g = giant_graph(1, 1600, avg_degree=4.0, n_bond_types=10)
    S = 4
    rng = np.random.default_rng(0)
    att_w = jnp.asarray(rng.normal(0, 0.5, (10,)), jnp.float32)
    self_r = jnp.float32(-0.2)
    mesh = make_mesh(data=2, graph=S)

    part_a = partition_giant_graph(g, S)
    spmm_a = make_partitioned_spmm(mesh, att_dim=10)
    out_a = np.asarray(spmm_a(part_a, jnp.asarray(part_a.node_feat),
                              att_w, self_r))

    part_r = partition_giant_graph_ring(g, S)
    spmm_r = make_ring_spmm(mesh, n_shards=S)
    out_r = np.asarray(spmm_r(part_r, jnp.asarray(part_r.node_feat),
                              att_w, self_r))

    n, f = g.num_atoms, g.atom_features.shape[1]
    np.testing.assert_allclose(
        out_r.reshape(-1, f)[:n], out_a.reshape(-1, f)[:n],
        rtol=1e-4, atol=1e-5,
    )


def test_ring_slot_budget():
    g = giant_graph(2, 777, avg_degree=3.0, n_bond_types=4)
    part = partition_giant_graph_ring(g, 3)
    assert int(part.mask_round.sum()) == 2 * g.num_bonds
