"""Edge-partitioned giant-graph aggregation with halo exchange.

The long-context analogue for graphs (SURVEY §5): when ONE graph's edge set
exceeds a chip (the 10-100M-edge synthetic stress configs in BASELINE.json),
nodes are partitioned contiguously across the 'graph' mesh axis; each shard
owns its nodes and their incoming edges.  Edge sources living on other
shards are satisfied from a HALO BUFFER of remote node features exchanged
over ICI before aggregation.

v1 exchange strategy: `all_gather` of the sharded feature array followed by
a static gather of each shard's halo ids — one fused XLA collective, optimal
when halos are a large fraction of nodes (random graphs) and still correct
when they are small.  A ppermute-ring variant that overlaps exchange with
per-source-shard partial aggregation is the planned optimization
(SURVEY §7.2 PR5).

All tables are built host-side once (static shapes); the device path is pure
gather/reduce, jit/shard_map friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..chem import MolGraph

TINY = 1e-9


@dataclasses.dataclass
class PartitionedGraph:
    """Giant graph partitioned over S shards (leading axis on every array).

    `neigh` indexes a per-shard LOCAL buffer laid out as
    [own nodes (Ns) | halo slots (H)]; `halo_ids` are GLOBAL node ids to
    fill the halo slots from (via all-gather + take)."""
    node_feat: np.ndarray    # [S, Ns, F]
    neigh: np.ndarray        # [S, Ns, D] int32 into [0, Ns+H)
    neigh_rel: np.ndarray    # [S, Ns, D, 5] int32
    neigh_mask: np.ndarray   # [S, Ns, D] f32
    halo_ids: np.ndarray     # [S, H] int32 global ids
    halo_mask: np.ndarray    # [S, H] f32
    node_mask: np.ndarray    # [S, Ns] f32
    node_conn: np.ndarray    # [S, Ns] f32
    node_tiny: np.ndarray    # [S, Ns] f32
    node_mol: np.ndarray     # [S, Ns] int32 graph segment id (padding -> G)

    @property
    def num_shards(self) -> int:
        return self.node_feat.shape[0]

    @property
    def nodes_per_shard(self) -> int:
        return self.node_feat.shape[1]

    @property
    def halo_size(self) -> int:
        return self.halo_ids.shape[1]


import jax.tree_util as _jtu

_jtu.register_dataclass(
    PartitionedGraph,
    data_fields=[f.name for f in dataclasses.fields(PartitionedGraph)],
    meta_fields=[],
)


def partition_giant_graph(
    g, n_shards: int, max_degree: int = 8
) -> PartitionedGraph:
    """Host-side partitioner: contiguous node ranges, per-shard ELL tables,
    deduplicated halo id lists padded to the max across shards.

    `g` may be one MolGraph or a LIST of them (a batch of giant graphs,
    each spanning all shards): graphs are concatenated node-wise and
    `node_mol` carries the per-node graph segment id for the readout."""
    graphs = list(g) if isinstance(g, (list, tuple)) else [g]
    sizes = [gr.num_atoms for gr in graphs]
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    n = int(offs[-1])
    ns = -(-n // n_shards)            # nodes per shard (ceil)
    n_pad = ns * n_shards

    mol_of = np.full(n_pad, len(graphs), np.int32)
    mol_n = np.zeros(n_pad, np.int32)  # own molecule's atom count
    for gi, gr in enumerate(graphs):
        mol_of[offs[gi]:offs[gi + 1]] = gi
        mol_n[offs[gi]:offs[gi + 1]] = sizes[gi]

    deg = np.zeros(n_pad, np.int32)
    neigh_g = np.zeros((n_pad, max_degree), np.int32)
    rel_g = np.zeros((n_pad, max_degree, 5), np.int32)
    nmask_g = np.zeros((n_pad, max_degree), np.float32)
    for gi, gr in enumerate(graphs):
        base = int(offs[gi])
        for k in range(gr.num_bonds):
            a = base + int(gr.bonds[k, 0])
            b = base + int(gr.bonds[k, 1])
            rel = gr.bond_relations[k]
            for (s, d) in ((a, b), (b, a)):
                if deg[d] >= max_degree:
                    raise ValueError(
                        f"node {d} exceeds max_degree {max_degree}")
                neigh_g[d, deg[d]] = s
                rel_g[d, deg[d]] = rel
                nmask_g[d, deg[d]] = 1.0
                deg[d] += 1

    owner = lambda v: v // ns
    halo_lists = []
    for s in range(n_shards):
        lo, hi = s * ns, (s + 1) * ns
        remote = set()
        for i in range(lo, min(hi, n)):
            for d in range(deg[i]):
                src = int(neigh_g[i, d])
                if owner(src) != s:
                    remote.add(src)
        halo_lists.append(sorted(remote))
    h = max((len(x) for x in halo_lists), default=0)
    h = max(h, 1)

    S = n_shards
    all_feat = np.concatenate([gr.atom_features for gr in graphs])
    feat = np.zeros((S, ns, all_feat.shape[1]), np.float32)
    neigh = np.zeros((S, ns, max_degree), np.int32)
    rels = np.zeros((S, ns, max_degree, 5), np.int32)
    nmask = np.zeros((S, ns, max_degree), np.float32)
    halo_ids = np.zeros((S, h), np.int32)
    halo_mask = np.zeros((S, h), np.float32)
    node_mask = np.zeros((S, ns), np.float32)
    node_tiny = np.zeros((S, ns), np.float32)
    node_mol = np.full((S, ns), len(graphs), np.int32)

    for s in range(S):
        lo = s * ns
        cnt = min(ns, n - lo) if lo < n else 0
        feat[s, :cnt] = all_feat[lo:lo + cnt]
        node_mask[s, :cnt] = 1.0
        node_mol[s, :cnt] = mol_of[lo:lo + cnt]
        remote_index = {v: ns + j for j, v in enumerate(halo_lists[s])}
        halo_ids[s, : len(halo_lists[s])] = halo_lists[s]
        halo_mask[s, : len(halo_lists[s])] = 1.0
        for i in range(cnt):
            gidx = lo + i
            # tiny mass: own molecule's (n_mol - deg) * 1e-9, identical to
            # the GraphBatcher (data/batching.py)
            node_tiny[s, i] = (mol_n[gidx] - deg[gidx]) * TINY
            for d in range(deg[gidx]):
                src = int(neigh_g[gidx, d])
                neigh[s, i, d] = (
                    src - lo if owner(src) == s else remote_index[src]
                )
                rels[s, i, d] = rel_g[gidx, d]
                nmask[s, i, d] = 1.0

    node_conn = (nmask.sum(-1) > 0).astype(np.float32)
    return PartitionedGraph(
        node_feat=feat, neigh=neigh, neigh_rel=rels, neigh_mask=nmask,
        halo_ids=halo_ids, halo_mask=halo_mask, node_mask=node_mask,
        node_conn=node_conn, node_tiny=node_tiny, node_mol=node_mol,
    )


# --------------------------------------------------------------------------
# device path (inside shard_map over the 'graph' axis)
# --------------------------------------------------------------------------

def halo_exchange(x_local: jnp.ndarray, halo_ids: jnp.ndarray,
                  axis_name: str = "graph") -> jnp.ndarray:
    """Fills the halo buffer: all-gather the sharded node features over ICI
    and take this shard's needed rows.  x_local [Ns, F] -> halo [H, F]."""
    xg = jax.lax.all_gather(x_local, axis_name)      # [S, Ns, F]
    flat = xg.reshape(-1, x_local.shape[-1])          # [S*Ns, F]
    return flat[halo_ids]


def halo_edge_attention_aggregate(
    part_local,                      # PartitionedGraph leaves w/o shard axis
    x_local: jnp.ndarray,            # [Ns, F]
    att_w: jnp.ndarray,              # [C] attention dictionary for one view
    self_r: jnp.ndarray,             # scalar
    rel_col: int = 0,
    axis_name: str = "graph",
) -> jnp.ndarray:
    """One edge-attention SpMM over the partitioned graph: identical math to
    the single-device view block (`models/layers.py`), sources resolved
    through the halo buffer."""
    halo = halo_exchange(x_local, part_local.halo_ids, axis_name)
    buffer = jnp.concatenate([x_local, halo], axis=0)      # [Ns+H, F]
    rel = part_local.neigh_rel[:, :, rel_col]
    sig = jax.nn.sigmoid(att_w[rel]) * part_local.neigh_mask
    sr = jax.nn.sigmoid(self_r)
    conn = part_local.node_conn
    denom = sig.sum(-1) + sr * conn + part_local.node_tiny + (1 - conn)
    gathered = buffer[part_local.neigh]                    # [Ns, D, F]
    agg = jnp.einsum("nd,ndf->nf", sig, gathered)
    return (agg + (sr * conn)[:, None] * x_local) / denom[:, None] * conn[:, None]


# --------------------------------------------------------------------------
# ring-ppermute variant: overlap halo exchange with partial aggregation
# --------------------------------------------------------------------------

@dataclasses.dataclass
class RingPartitionedGraph:
    """Per-round ELL tables: in ring round r each shard holds the node block
    of shard (s - r) mod S and aggregates exactly the edges whose source
    lives there.  `neigh_round[r]` indexes INTO THAT BLOCK; round 0 is the
    local block.  XLA overlaps the next `ppermute` with the current round's
    aggregation (no data dependence)."""
    node_feat: np.ndarray      # [S, Ns, F]
    neigh_round: np.ndarray    # [S, R, Ns, D] block-local source index
    rel_round: np.ndarray      # [S, R, Ns, D] relation id (view 0)
    mask_round: np.ndarray     # [S, R, Ns, D]
    node_mask: np.ndarray      # [S, Ns]
    node_conn: np.ndarray      # [S, Ns]
    node_tiny: np.ndarray      # [S, Ns]


_jtu.register_dataclass(
    RingPartitionedGraph,
    data_fields=[f.name for f in dataclasses.fields(RingPartitionedGraph)],
    meta_fields=[],
)


def partition_giant_graph_ring(
    g: MolGraph, n_shards: int, max_degree: int = 8, rel_col: int = 0,
) -> RingPartitionedGraph:
    n = g.num_atoms
    ns = -(-n // n_shards)
    S, R = n_shards, n_shards
    feat = np.zeros((S, ns, g.atom_features.shape[1]), np.float32)
    neigh_round = np.zeros((S, R, ns, max_degree), np.int32)
    rel_round = np.zeros((S, R, ns, max_degree), np.int32)
    mask_round = np.zeros((S, R, ns, max_degree), np.float32)
    node_mask = np.zeros((S, ns), np.float32)
    node_tiny = np.zeros((S, ns), np.float32)
    deg = np.zeros(n, np.int32)
    slots = np.zeros((S, ns), np.int32)  # per-dst slot cursor (shared
    # across rounds so total slots per node never exceed max_degree)

    def add_dir(src: int, dst: int, rel: int):
        s_dst, i_dst = dst // ns, dst % ns
        s_src, i_src = src // ns, src % ns
        r = (s_dst - s_src) % S
        d = slots[s_dst, i_dst]
        if d >= max_degree:
            raise ValueError(f"node {dst} exceeds max_degree {max_degree}")
        neigh_round[s_dst, r, i_dst, d] = i_src
        rel_round[s_dst, r, i_dst, d] = rel
        mask_round[s_dst, r, i_dst, d] = 1.0
        slots[s_dst, i_dst] += 1
        deg[dst] += 1

    for k in range(g.num_bonds):
        a, b = int(g.bonds[k, 0]), int(g.bonds[k, 1])
        rel = int(g.bond_relations[k, rel_col])
        add_dir(b, a, rel)
        add_dir(a, b, rel)

    for s in range(S):
        lo = s * ns
        cnt = min(ns, n - lo) if lo < n else 0
        feat[s, :cnt] = g.atom_features[lo:lo + cnt]
        node_mask[s, :cnt] = 1.0
        node_tiny[s, :cnt] = (n - deg[lo:lo + cnt]) * TINY
    node_conn = (slots > 0).astype(np.float32) * node_mask
    return RingPartitionedGraph(
        node_feat=feat, neigh_round=neigh_round, rel_round=rel_round,
        mask_round=mask_round, node_mask=node_mask, node_conn=node_conn,
        node_tiny=node_tiny,
    )


def ring_edge_attention_aggregate(
    part_local,                     # RingPartitionedGraph leaves, no S axis
    x_local: jnp.ndarray,           # [Ns, F]
    att_w: jnp.ndarray,
    self_r: jnp.ndarray,
    axis_name: str = "graph",
    n_shards: int = 1,
) -> jnp.ndarray:
    """Ring-overlap SpMM: round r aggregates from the block received after
    r hops while the next hop's `ppermute` is in flight."""
    sr = jax.nn.sigmoid(self_r)
    conn = part_local.node_conn
    ns, f = x_local.shape
    agg = jnp.zeros((ns, f), jnp.float32)
    denom_edges = jnp.zeros((ns,), jnp.float32)
    block = x_local
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    from ..ops.aggregate import edge_scores

    for r in range(n_shards):
        sig = edge_scores(att_w, part_local.rel_round[r],
                          part_local.mask_round[r])   # [Ns, D]
        gathered = block[part_local.neigh_round[r]]   # [Ns, D, F]
        agg = agg + jnp.einsum("nd,ndf->nf", sig, gathered)
        denom_edges = denom_edges + sig.sum(-1)
        if r + 1 < n_shards:
            # send our current block one hop forward; receive the previous
            # shard's — independent of this round's einsum, so XLA overlaps
            block = jax.lax.ppermute(block, axis_name, perm)
    denom = denom_edges + sr * conn + part_local.node_tiny + (1 - conn)
    return (agg + (sr * conn)[:, None] * x_local) / denom[:, None] * conn[:, None]


def make_ring_spmm(mesh, n_shards: int):
    from jax.sharding import PartitionSpec as P

    def per_shard(part, x, att_w, self_r):
        local = jax.tree_util.tree_map(lambda a: a[0], part)
        out = ring_edge_attention_aggregate(
            local, x[0], att_w, self_r, n_shards=n_shards
        )
        return out[None]

    return jax.jit(jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("graph"), P("graph"), P(), P()),
        out_specs=P("graph"),
        check_vma=False,
    ))


def make_partitioned_spmm(mesh, att_dim: int, rel_col: int = 0):
    """Builds the jitted shard_map'd multi-shard SpMM:
    (part [S,...], x [S,Ns,F], att_w [C], self_r) -> out [S,Ns,F]."""
    from jax.sharding import PartitionSpec as P

    def per_shard(part, x, att_w, self_r):
        local_part = jax.tree_util.tree_map(lambda a: a[0], part)
        out = halo_edge_attention_aggregate(
            local_part, x[0], att_w, self_r, rel_col
        )
        return out[None]

    return jax.jit(jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("graph"), P("graph"), P(), P()),
        out_specs=P("graph"),
        check_vma=False,
    ))
