"""Scaling-efficiency harness.

Measures edge-attention SpMM throughput (directed edges/s) over a giant
edge-partitioned graph at increasing 'graph'-axis shard counts, reporting
scaling efficiency vs the single-shard run — the BASELINE.json
"edges/s scaling efficiency at 1 chip / 1 host / N hosts" metric.  On a
CPU-forced mesh this validates mechanics; numbers are meaningful on real
multi-chip slices (the halo exchange then rides ICI)."""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..data.synthetic import giant_graph
from .edge_partition import make_partitioned_spmm, partition_giant_graph
from .mesh import make_mesh


def run_scaling_bench(
    n_nodes: int = 200_000,
    avg_degree: float = 4.0,
    shard_counts: List[int] | None = None,
    n_bond_types: int = 20,
    iters: int = 10,
    seed: int = 0,
    span: int | None = None,
) -> Dict:
    devs = jax.devices()
    if shard_counts is None:
        shard_counts = [s for s in (1, 2, 4, 8, 16) if s <= len(devs)]
    g = giant_graph(seed, n_nodes, avg_degree, n_bond_types,
                    span=span)
    n_edges = 2 * g.num_bonds
    att_w = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.5, (n_bond_types,)), jnp.float32
    )
    self_r = jnp.float32(0.1)

    results = {"n_nodes": n_nodes, "n_directed_edges": n_edges, "runs": []}
    base_eps = None
    for s in shard_counts:
        mesh = make_mesh(data=1, graph=s, devices=devs[:s])
        part = partition_giant_graph(g, s)
        spmm = make_partitioned_spmm(mesh, att_dim=n_bond_types)
        x = jnp.asarray(part.node_feat)
        out = spmm(part, x, att_w, self_r)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = spmm(part, x, att_w, self_r)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        eps = n_edges / dt
        if base_eps is None:
            base_eps = eps
        eff = eps / (base_eps * s)
        results["runs"].append({
            "shards": s,
            "ms_per_spmm": round(dt * 1e3, 3),
            "edges_per_s": round(eps, 1),
            "scaling_efficiency": round(eff, 4),
            "halo_fraction": round(
                float(part.halo_mask.sum())
                / max(1.0, float(part.node_mask.sum())), 4),
        })
    return results
