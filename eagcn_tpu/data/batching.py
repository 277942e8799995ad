"""Static-shape packed mega-graph batching.

The reference pads every batch to its own max molecule size inside the
collate function (`eagcn_pytorch/utils.py:504-640`) — dynamic shapes that
would retrigger XLA compilation on every step.  Here many molecules are
packed into ONE fixed-size graph ("mega-graph") per batch:

* node arrays padded to a static `num_nodes`
* neighbourhoods stored in ELLPACK form (`neigh[N, D]`) — molecular graphs
  have max degree <= 5 (enforced by the featurizer's heavy-neighbour
  one-hot, `neural_fp.py:317-322`), so a fixed-width neighbour list wastes
  almost nothing and turns aggregation into a vectorized gather + small
  reduction (MXU/VPU-friendly, no scatter)
* a COO view (`edge_src/edge_dst`) is also emitted for the segment-sum
  aggregation backend and for kernels that prefer edge-major layout
* per-molecule segment ids drive the readout (`segment_sum` over
  `node_mol`); padding nodes map to an extra dummy segment
* optionally (`tile_size` > 0) molecules are packed WITHOUT straddling
  tile boundaries and block-dense relation tiles are emitted
  (`tile_adj [T,S,S]`, `tile_rel [T,5,S,S]` — view-major so every per-view
  [S,S] relation block is lane-aligned for the TPU kernels).  The
  mega-graph adjacency is
  block-diagonal with tiny (<=S-atom) blocks, so neighborhood aggregation
  becomes a batched DENSE matmul `[T,S,S] @ [T,S,F]` that rides the MXU —
  no gathers, no scatters, and the backward is two more batched matmuls.
  This is the TPU-native speed path for molecule-scale graphs; the ELL
  gather path remains for giant sharded graphs where dense tiles would
  not fit.

Every batch produced by one `GraphBatcher` has identical shapes, so the
whole training run compiles exactly one step function.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from ..chem import MolGraph
from .dataset import FeaturizedDataset

# row-normalization tiny mass, `layers.py:294` mask_tiny = (1-adj)*1e-9
TINY = 1e-9

MAX_DEGREE = 6  # featurizer guarantees <=5; 6 leaves one slot of headroom


@dataclasses.dataclass
class GraphBatch:
    """One packed mega-graph (host-side numpy or device jnp arrays — the
    model treats it as a pytree of arrays)."""
    # nodes
    node_feat: np.ndarray       # [N, F] f32 normalized atom features
    node_mol: np.ndarray        # [N] i32 molecule segment id; padding -> B
    node_mask: np.ndarray       # [N] f32 1 for real atoms
    node_conn: np.ndarray       # [N] f32 1 for real atoms with degree>0 (mask2)
    node_tiny: np.ndarray       # [N] f32 (mol_atoms - deg) * 1e-9 row-norm mass
    node_subtype: np.ndarray    # [N] i32 analysis labels
    # ELLPACK neighbourhoods
    neigh: np.ndarray           # [N, D] i32 neighbour node index (0 when padded)
    neigh_rel: np.ndarray       # [N, D, 5] i32 relation ids
    neigh_mask: np.ndarray      # [N, D] f32
    # reverse-slot table: neigh[neigh[j,d], neigh_rev[j,d]] == j.  Molecular
    # graphs are symmetric, so the TRANSPOSE of the attention matrix is
    # reachable by gathers alone — this powers the scatter-free custom VJP
    # of the aggregation (ops/aggregate.py); scatter-add is pathologically
    # slow on TPU.
    neigh_rev: np.ndarray       # [N, D] i32
    # COO view (directed edges, both directions of each bond)
    edge_src: np.ndarray        # [E] i32
    edge_dst: np.ndarray        # [E] i32
    edge_rel: np.ndarray        # [E, 5] i32
    edge_mask: np.ndarray       # [E] f32
    # molecules
    labels: np.ndarray          # [B, T] f32
    mol_mask: np.ndarray        # [B] f32
    mol_size: np.ndarray        # [B] f32 number of atoms
    mol_index: np.ndarray       # [B] i32 dataset row index (dumps/debug)
    # block-dense tiles (empty unless BatchShape.tile_size > 0)
    tile_adj: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 0, 0), np.int8))   # [T, S, S]
    tile_rel: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 5, 0, 0), np.int8))  # [T,5,S,S]
    # tile-local readout tables (empty unless tile-aligned packing):
    # pool_sel[t, i, j] = 1 iff row i of tile t is a real atom of molecule
    # (first molecule id in tile t) + j.  Because `pack` never lets a
    # molecule cross a tile boundary, each molecule lives in exactly one
    # tile and the sum-over-atoms readout (`models.py:108`) becomes one
    # MXU bmm + a row gather — no scatter (ops/aggregate.py:tile_readout).
    pool_sel: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 0, 0), np.int8))   # [T, S, S]
    mol_slot: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0,), np.int32))       # [B]

    @property
    def num_nodes(self) -> int:
        return int(self.node_feat.shape[0])

    @property
    def num_mols(self) -> int:
        return int(self.labels.shape[0])

    @property
    def max_degree(self) -> int:
        return int(self.neigh.shape[1])


# Register as a JAX pytree so batches flow through jit/shard_map unchanged.
import jax.tree_util as _jtu  # noqa: E402

_jtu.register_dataclass(
    GraphBatch,
    data_fields=[f.name for f in dataclasses.fields(GraphBatch)],
    meta_fields=[],
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _advance_aligned(cursor: int, n: int, tile: int) -> int:
    """Next placement cursor such that [cursor, cursor+n) stays within one
    tile (molecules may not straddle tile boundaries)."""
    if cursor // tile != (cursor + n - 1) // tile:
        return _round_up(cursor, tile)
    return cursor


def _empty_tiles():
    return (np.zeros((0, 0, 0), np.int8), np.zeros((0, 5, 0, 0), np.int8))


def build_pool_tables(node_mol: np.ndarray, node_mask: np.ndarray,
                      tile_size: int, num_mols: int):
    """(pool_sel [T,S,S] i8, mol_slot [B] i32) for the tile-local readout.

    Valid only for tile-aligned packing (no molecule crosses a tile
    boundary; molecule ids ascend with the node cursor — both guaranteed
    by `GraphBatcher.pack` / the native packer).  `mol_slot[b]` is the
    flat row of `einsum('tij,tif->tjf', pool_sel, x)` holding molecule
    b's atom sum; padding molecules point at row 0 and are masked by
    `mol_mask` in the op."""
    S = int(tile_size)
    N = int(node_mol.shape[0])
    T = N // S
    B = int(num_mols)
    ids = np.where(node_mask > 0, node_mol, B).reshape(T, S)  # B > real ids
    mol_lo = ids.min(axis=1)                                  # [T]
    local = ids - mol_lo[:, None]
    pool_sel = np.zeros((T, S, S), np.int8)
    t_idx, s_idx = np.nonzero(ids < B)
    pool_sel[t_idx, s_idx, local[t_idx, s_idx]] = 1
    mol_slot = np.zeros((B,), np.int32)
    flat = ids.reshape(-1)
    rows = np.flatnonzero(flat < B)
    if rows.size:
        vals = flat[rows]                  # ascending (packing order)
        n_real = int(vals[-1]) + 1
        first = rows[np.searchsorted(vals, np.arange(n_real))]
        t_of = first // S
        mol_slot[:n_real] = t_of * S + (np.arange(n_real) - mol_lo[t_of])
    return pool_sel, mol_slot


@dataclasses.dataclass
class BatchShape:
    num_nodes: int
    num_edges: int
    num_mols: int
    max_degree: int = MAX_DEGREE
    tile_size: int = 0          # >0: block-dense tiles (must divide num_nodes)


def pick_tile_size(max_mol_atoms: int, minimum: int = 128) -> int:
    """Smallest power-of-two tile >= the largest molecule (a molecule may
    not straddle a tile boundary).  128 is the MXU-native lane width; HIV's
    largest kept molecule (222 atoms) needs 256."""
    s = minimum
    while s < max_mol_atoms:
        s *= 2
    return s


def plan_batch_shape(
    sizes: np.ndarray,
    bonds: np.ndarray,
    batch_mols: int,
    slack: float = 1.15,
    align: int = 128,
    tile_size: int = 0,
) -> BatchShape:
    """Chooses static budgets so that `batch_mols` molecules almost always
    fit: node budget = mean-based estimate + the largest molecule (so no
    molecule is unpackable), aligned to TPU-friendly multiples.  With
    tiles, boundary alignment wastes ~mean_n/2 nodes per tile — budgeted
    explicitly."""
    mean_n = float(np.mean(sizes))
    mean_e = float(np.mean(bonds))
    est_nodes = batch_mols * mean_n * slack + np.max(sizes)
    if tile_size:
        est_nodes *= 1.0 + mean_n / (2.0 * tile_size)
        align = max(align, tile_size)
    num_nodes = _round_up(int(est_nodes), align)
    num_edges = _round_up(int(2 * (batch_mols * mean_e * slack + np.max(bonds))), align)
    return BatchShape(num_nodes=num_nodes, num_edges=num_edges,
                      num_mols=batch_mols, tile_size=tile_size)


def build_tile_tensors(
    edge_src: np.ndarray, edge_dst: np.ndarray, edge_rel: np.ndarray,
    edge_mask: np.ndarray, num_nodes: int, tile_size: int,
):
    """Block-dense relation tiles from the COO edge view.  Row index =
    destination atom (aggregation computes out[i] = sum_j A[i,j] x[j]),
    matching the ELL `neigh` convention.  Requires aligned packing (every
    edge intra-tile)."""
    S = tile_size
    T = num_nodes // S
    adj = np.zeros((T, S, S), np.int8)
    rel = np.zeros((T, 5, S, S), np.int8)
    m = edge_mask > 0
    d, s = edge_dst[m], edge_src[m]
    t = d // S
    if not np.array_equal(s // S, t):
        raise ValueError("edge crosses a tile boundary — pack with tile_size")
    if edge_rel[m].size and edge_rel[m].max() > 127:
        raise ValueError("relation id exceeds int8 tile storage")
    adj[t, d % S, s % S] = 1
    for q in range(5):
        rel[t, q, d % S, s % S] = edge_rel[m][:, q]
    return adj, rel


class GraphBatcher:
    """Packs molecules into fixed-shape mega-graph batches."""

    def __init__(self, shape: BatchShape):
        self.shape = shape

    def pack(
        self,
        graphs: Sequence[MolGraph],
        labels: np.ndarray,
        indices: Sequence[int],
    ) -> GraphBatch:
        """Packs up to shape.num_mols molecules (callers guarantee that the
        node/edge budgets hold — `iter_batches` does)."""
        sh = self.shape
        N, E, B, D = sh.num_nodes, sh.num_edges, sh.num_mols, sh.max_degree
        n_tasks = labels.shape[1]
        F = graphs[0].atom_features.shape[1] if graphs else 24

        node_feat = np.zeros((N, F), dtype=np.float32)
        node_mol = np.full((N,), B, dtype=np.int32)
        node_mask = np.zeros((N,), dtype=np.float32)
        node_subtype = np.zeros((N,), dtype=np.int32)
        node_tiny = np.zeros((N,), dtype=np.float32)
        deg = np.zeros((N,), dtype=np.int32)
        neigh = np.zeros((N, D), dtype=np.int32)
        neigh_rel = np.zeros((N, D, 5), dtype=np.int32)
        neigh_mask = np.zeros((N, D), dtype=np.float32)
        neigh_rev = np.zeros((N, D), dtype=np.int32)
        edge_src = np.zeros((E,), dtype=np.int32)
        edge_dst = np.zeros((E,), dtype=np.int32)
        edge_rel = np.zeros((E, 5), dtype=np.int32)
        edge_mask = np.zeros((E,), dtype=np.float32)
        out_labels = np.zeros((B, n_tasks), dtype=np.float32)
        mol_mask = np.zeros((B,), dtype=np.float32)
        mol_size = np.zeros((B,), dtype=np.float32)
        mol_index = np.full((B,), -1, dtype=np.int32)

        n_cursor = 0
        e_cursor = 0
        for b, (g, idx) in enumerate(zip(graphs, indices)):
            n, m = g.num_atoms, g.num_bonds
            if sh.tile_size:
                if n > sh.tile_size:
                    raise ValueError(
                        f"molecule with {n} atoms exceeds tile_size "
                        f"{sh.tile_size}; use pick_tile_size"
                    )
                n_cursor = _advance_aligned(n_cursor, n, sh.tile_size)
            if b >= B or n_cursor + n > N or e_cursor + 2 * m > E:
                raise ValueError(
                    f"batch budget exceeded: mol {b} needs n={n} e={2*m} at "
                    f"cursors ({n_cursor}/{N}, {e_cursor}/{E})"
                )
            base = n_cursor
            node_feat[base:base + n] = g.atom_features
            node_mol[base:base + n] = b
            node_mask[base:base + n] = 1.0
            node_subtype[base:base + n] = g.subtypes
            for k in range(m):
                i = base + int(g.bonds[k, 0])
                j = base + int(g.bonds[k, 1])
                rel = g.bond_relations[k]
                slot_i, slot_j = deg[i], deg[j]
                neigh_rev[i, slot_i] = slot_j   # j's slot holding i
                neigh_rev[j, slot_j] = slot_i
                for (s, d) in ((i, j), (j, i)):
                    slot = deg[d]
                    neigh[d, slot] = s
                    neigh_rel[d, slot] = rel
                    neigh_mask[d, slot] = 1.0
                    deg[d] += 1
                    edge_src[e_cursor] = s
                    edge_dst[e_cursor] = d
                    edge_rel[e_cursor] = rel
                    edge_mask[e_cursor] = 1.0
                    e_cursor += 1
            # row-norm tiny mass: dense-equivalent (1-adj)*1e-9 row sum over
            # the molecule's own n x n block (padding-independent variant of
            # layers.py:294; see models/layers.py docstring)
            node_tiny[base:base + n] = (n - deg[base:base + n]) * TINY
            out_labels[b] = labels[b]
            mol_mask[b] = 1.0
            mol_size[b] = float(n)
            mol_index[b] = int(idx)
            n_cursor += n

        node_conn = (deg > 0).astype(np.float32)
        tile_adj, tile_rel = _empty_tiles()
        pool_sel = np.zeros((0, 0, 0), np.int8)
        mol_slot = np.zeros((0,), np.int32)
        if sh.tile_size:
            tile_adj, tile_rel = build_tile_tensors(
                edge_src, edge_dst, edge_rel, edge_mask, N, sh.tile_size
            )
            pool_sel, mol_slot = build_pool_tables(
                node_mol, node_mask, sh.tile_size, B
            )
        return GraphBatch(
            tile_adj=tile_adj, tile_rel=tile_rel,
            pool_sel=pool_sel, mol_slot=mol_slot,
            node_feat=node_feat, node_mol=node_mol, node_mask=node_mask,
            node_conn=node_conn, node_tiny=node_tiny, node_subtype=node_subtype,
            neigh=neigh, neigh_rel=neigh_rel, neigh_mask=neigh_mask,
            neigh_rev=neigh_rev,
            edge_src=edge_src, edge_dst=edge_dst, edge_rel=edge_rel,
            edge_mask=edge_mask, labels=out_labels, mol_mask=mol_mask,
            mol_size=mol_size, mol_index=mol_index,
        )


def pack_single_giant(g: MolGraph, shape: BatchShape,
                      label: Optional[np.ndarray] = None) -> GraphBatch:
    """Vectorized packer for ONE giant graph (the 10-100M-edge stress
    configs): `GraphBatcher.pack` walks bonds in a Python loop, which is
    fine for molecules but takes tens of minutes at 50M bonds.  This
    builds the same ELL/COO tables with numpy sorts/scatters in seconds.

    Slot ORDER within a node's ELL row differs from the sequential packer
    (stable sort by destination vs per-bond interleaving) — aggregation is
    slot-permutation-invariant and `neigh_rev` is constructed consistently
    (tests/test_batching.py::test_pack_single_giant_matches_sequential)."""
    sh = shape
    N, E, D = sh.num_nodes, sh.num_edges, sh.max_degree
    if sh.tile_size:
        raise ValueError("giant packer supports gather layouts only")
    n, m = g.num_atoms, g.num_bonds
    if n > N or 2 * m > E:
        raise ValueError(f"budget exceeded: need ({n}, {2*m}), "
                         f"shape ({N}, {E})")
    F = g.atom_features.shape[1]
    n_tasks = 1 if label is None else int(np.asarray(label).size)

    # directed COO: both directions of every bond, bond-major
    b0 = g.bonds[:, 0].astype(np.int64)
    b1 = g.bonds[:, 1].astype(np.int64)
    src = np.concatenate([b0, b1])
    dst = np.concatenate([b1, b0])
    pair = np.concatenate([np.arange(m, 2 * m), np.arange(0, m)])

    # ELL slots: stable sort by destination; slot = rank within group
    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    deg = np.bincount(dst, minlength=N).astype(np.int32)
    if m and int(deg.max()) > D:
        raise ValueError(f"degree {int(deg.max())} exceeds max_degree {D}")
    group_start = np.zeros(N, np.int64)
    np.cumsum(deg[:-1], out=group_start[1:])
    slot_s = np.arange(2 * m, dtype=np.int64) - group_start[dst_s]
    slot = np.empty(2 * m, np.int64)
    slot[order] = slot_s                      # slot of directed edge e

    neigh = np.zeros((N, D), np.int32)
    neigh_rel = np.zeros((N, D, 5), np.int32)
    neigh_mask = np.zeros((N, D), np.float32)
    neigh_rev = np.zeros((N, D), np.int32)
    rel2 = np.concatenate([g.bond_relations, g.bond_relations]).astype(
        np.int32)
    neigh[dst, slot] = src
    neigh_rel[dst, slot] = rel2
    neigh_mask[dst, slot] = 1.0
    neigh_rev[dst, slot] = slot[pair]         # slot of (d, s) in s's row

    node_feat = np.zeros((N, F), np.float32)
    node_feat[:n] = g.atom_features
    node_mol = np.full((N,), 1, np.int32)
    node_mol[:n] = 0
    node_mask = np.zeros((N,), np.float32)
    node_mask[:n] = 1.0
    node_subtype = np.zeros((N,), np.int32)
    node_subtype[:n] = g.subtypes
    node_tiny = np.zeros((N,), np.float32)
    node_tiny[:n] = (n - deg[:n]) * TINY

    edge_src = np.zeros((E,), np.int32)
    edge_dst = np.zeros((E,), np.int32)
    edge_rel = np.zeros((E, 5), np.int32)
    edge_mask = np.zeros((E,), np.float32)
    edge_src[: 2 * m] = src
    edge_dst[: 2 * m] = dst
    edge_rel[: 2 * m] = rel2
    edge_mask[: 2 * m] = 1.0

    lab = np.zeros((1, n_tasks), np.float32)
    if label is not None:
        lab[0] = np.asarray(label, np.float32).reshape(-1)
    return GraphBatch(
        node_feat=node_feat, node_mol=node_mol, node_mask=node_mask,
        node_conn=(deg > 0).astype(np.float32), node_tiny=node_tiny,
        node_subtype=node_subtype,
        neigh=neigh, neigh_rel=neigh_rel, neigh_mask=neigh_mask,
        neigh_rev=neigh_rev,
        edge_src=edge_src, edge_dst=edge_dst, edge_rel=edge_rel,
        edge_mask=edge_mask, labels=lab,
        mol_mask=np.ones((1,), np.float32),
        mol_size=np.asarray([float(n)], np.float32),
        mol_index=np.zeros((1,), np.int32),
    )


def pack_from_dataset(
    ds: FeaturizedDataset, ids: Sequence[int], shape: BatchShape,
    use_native: bool = True,
) -> GraphBatch:
    """Packs dataset rows `ids` into one batch, preferring the C++ packer
    (bit-identical to the Python path; tests/test_native.py)."""
    if use_native:
        from ..chem.native import native_available, native_pack

        if native_available():
            afm, bonds, rels, subs, node_off, bond_off = ds.concat_arrays()
            out = native_pack(
                afm, bonds, rels, subs, node_off, bond_off, ids,
                shape.num_nodes, shape.num_edges, shape.num_mols,
                shape.max_degree, tile_size=shape.tile_size,
            )
            if out is not None:
                n_tasks = ds.labels.shape[1]
                lab = np.zeros((shape.num_mols, n_tasks), np.float32)
                if len(ids):
                    lab[: len(ids)] = ds.labels[np.asarray(ids, np.int64)]
                gb = GraphBatch(labels=lab, **out)
                if shape.tile_size:
                    ps, ms = build_pool_tables(
                        gb.node_mol, gb.node_mask, shape.tile_size,
                        shape.num_mols,
                    )
                    gb = dataclasses.replace(gb, pool_sel=ps, mol_slot=ms)
                return gb
    batcher = GraphBatcher(shape)
    graphs = [ds.graphs[int(i)] for i in ids]
    labels = (np.stack([ds.labels[int(i)] for i in ids])
              if len(ids) else np.zeros((0, ds.labels.shape[1]), np.float32))
    return batcher.pack(graphs, labels, list(ids))


def iter_batches(
    ds: FeaturizedDataset,
    indices: np.ndarray,
    shape: BatchShape,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    drop_remainder: bool = False,
    use_native: bool = True,
) -> Iterator[GraphBatch]:
    """Greedy packing of the index stream into fixed-shape batches."""
    order = np.array(indices, copy=True)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    cur_idx: List[int] = []
    n_used = 0
    e_used = 0
    for i in order:
        g = ds.graphs[int(i)]
        n, e = g.num_atoms, 2 * g.num_bonds
        n_start = (_advance_aligned(n_used, n, shape.tile_size)
                   if shape.tile_size else n_used)
        if (
            len(cur_idx) >= shape.num_mols
            or n_start + n > shape.num_nodes
            or e_used + e > shape.num_edges
        ):
            yield pack_from_dataset(ds, cur_idx, shape, use_native)
            cur_idx, n_used, e_used = [], 0, 0
            n_start = 0
        cur_idx.append(int(i))
        n_used = n_start + n
        e_used += e
    if cur_idx and not drop_remainder:
        yield pack_from_dataset(ds, cur_idx, shape, use_native)


def batch_to_jax(batch: GraphBatch):
    """Moves a host batch to device arrays (jnp) as the same dataclass."""
    import jax.numpy as jnp

    return GraphBatch(**{
        f.name: jnp.asarray(getattr(batch, f.name))
        for f in dataclasses.fields(GraphBatch)
    })
