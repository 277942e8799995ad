"""Synthetic molecule-like graph generators.

Used by the benchmark harness, the driver entry points, and the scaling
stress configs (the BASELINE.json "synthetic scaled mega-graph" workload):
random connected graphs with molecular statistics — bounded degree (<=5,
matching the featurizer's guarantee), ~1.05 bonds/atom, plausible relation
ids — plus arbitrarily large single giant graphs for edge-partition runs."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..chem import MolGraph, NUM_ATOM_FEATURES


def random_molecule(
    rng: np.random.Generator,
    n_atoms: int,
    n_bond_types: int = 20,
    extra_edge_frac: float = 0.12,
) -> MolGraph:
    """Random tree + a few ring-closing edges, degree-capped at 5."""
    deg = np.zeros(n_atoms, dtype=np.int32)
    edges = []
    edge_set = set()
    for i in range(1, n_atoms):
        # attach to a random earlier atom with remaining capacity
        for _ in range(10):
            j = int(rng.integers(0, i))
            if deg[j] < 5:
                break
        edges.append((j, i))
        edge_set.add((j, i))
        deg[j] += 1
        deg[i] += 1
    n_extra = int(extra_edge_frac * n_atoms)
    for _ in range(n_extra):
        a, b = int(rng.integers(0, n_atoms)), int(rng.integers(0, n_atoms))
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key in edge_set or deg[a] >= 5 or deg[b] >= 5:
            continue
        edges.append(key)
        edge_set.add(key)
        deg[a] += 1
        deg[b] += 1

    m = len(edges)
    bonds = np.asarray(edges, dtype=np.int32)
    rels = np.zeros((m, 5), dtype=np.int32)
    rels[:, 0] = rng.integers(0, n_bond_types, m)
    rels[:, 1] = rng.integers(0, 4, m)
    rels[:, 2] = rng.integers(0, 2, m)
    rels[:, 3] = rng.integers(0, 2, m)
    rels[:, 4] = rng.integers(0, 2, m)
    feats = rng.random((n_atoms, NUM_ATOM_FEATURES), dtype=np.float32)
    return MolGraph(
        atom_features=feats,
        bonds=bonds,
        bond_relations=rels,
        subtypes=np.ones((n_atoms,), dtype=np.int32),
        smiles="<synthetic>",
    )


def random_molecule_set(
    seed: int,
    n_mols: int,
    mean_atoms: float = 25.0,
    n_bond_types: int = 20,
    n_tasks: int = 1,
) -> Tuple[List[MolGraph], np.ndarray]:
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_mols):
        n = max(4, int(rng.normal(mean_atoms, mean_atoms * 0.35)))
        graphs.append(random_molecule(rng, n, n_bond_types))
    labels = rng.normal(0.0, 1.0, (n_mols, n_tasks)).astype(np.float32)
    return graphs, labels


def giant_graph(
    seed: int,
    n_nodes: int,
    avg_degree: float = 4.0,
    n_bond_types: int = 20,
    max_degree: int = 8,
    span: int | None = None,
) -> MolGraph:
    """One connected giant graph (ring backbone + random chords) for the
    10-100M-edge edge-partition stress runs.  Degree capped at
    `max_degree` so ELL tables stay fixed width.

    `span` bounds chord length |a-b| (graph locality).  A locality-free
    random graph is communication-dominated under ANY partitioner (halo
    ~= nodes); real giant graphs (molecular assemblies, spatial/mesh
    graphs) are local, so the scaling stress uses a window."""
    rng = np.random.default_rng(seed)
    backbone = np.stack(
        [np.arange(n_nodes, dtype=np.int32),
         (np.arange(n_nodes, dtype=np.int32) + 1) % n_nodes], axis=1
    )
    deg = np.full(n_nodes, 2, dtype=np.int32)
    n_extra = int(n_nodes * (avg_degree - 2.0) / 2.0)
    a_raw = rng.integers(0, n_nodes, (max(n_extra, 0),)).astype(np.int32)
    if span is None:
        b_raw = rng.integers(0, n_nodes, a_raw.shape).astype(np.int32)
    else:
        off = rng.integers(-span, span + 1, a_raw.shape).astype(np.int32)
        b_raw = np.clip(a_raw + off, 0, n_nodes - 1)
    chords_raw = np.stack([a_raw, b_raw], axis=1)
    chords = []
    for a, b in chords_raw:
        if a != b and deg[a] < max_degree and deg[b] < max_degree:
            chords.append((a, b))
            deg[a] += 1
            deg[b] += 1
    chords = np.asarray(chords, dtype=np.int32).reshape(-1, 2)
    bonds = np.concatenate([backbone, chords])
    m = bonds.shape[0]
    rels = np.zeros((m, 5), dtype=np.int32)
    rels[:, 0] = rng.integers(0, n_bond_types, m)
    rels[:, 1] = rng.integers(0, 4, m)
    rels[:, 2:] = rng.integers(0, 2, (m, 3))
    feats = rng.random((n_nodes, NUM_ATOM_FEATURES), dtype=np.float32)
    return MolGraph(
        atom_features=feats,
        bonds=bonds,
        bond_relations=rels,
        subtypes=np.ones((n_nodes,), dtype=np.int32),
        smiles="<giant>",
    )
