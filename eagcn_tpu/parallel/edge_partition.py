"""Edge-partitioned giant-graph aggregation with halo exchange.

The long-context analogue for graphs (SURVEY §5): when ONE graph's edge set
exceeds a chip (the 10-100M-edge synthetic stress configs in BASELINE.json),
nodes are partitioned contiguously across the 'graph' mesh axis; each shard
owns its nodes and their incoming edges.  Edge sources living on other
shards are satisfied from a HALO BUFFER of remote node features exchanged
over ICI before aggregation.

Exchange strategy (v2, default): PACKED halo rows over `all_to_all` — each
shard gathers exactly the rows its neighbors requested (host-built static
send tables) and moves S*Hp*F floats per exchange, proportional to the halo
size, instead of all-gathering the full [S*Ns, F] feature array.  Measured
halo fractions on the 10M-edge stress graphs are 0.1-0.9% (SCALING_r3), so
the packed exchange moves ~100x fewer bytes per layer.  The all-gather v1
path is kept (`packed=False`) as a fallback/baseline for A/B measurement.
A ppermute-ring variant that overlaps exchange with per-source-shard
partial aggregation exists below for the single-view SpMM.

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
    [own nodes (Ns) | halo slots (S*Hp)].  The halo region is grouped by
    OWNER shard into S fixed-width segments of Hp slots, so the result of
    `all_to_all(x_local[send_ids])` IS the halo buffer — no reshuffle.
    `halo_ids` holds the same slots as GLOBAL node ids for the all-gather
    fallback path; `send_ids[d]` are the LOCAL row indices this shard must
    ship to destination shard d (padding slots repeat row 0 — their
    contents are never referenced by `neigh`)."""
    node_feat: np.ndarray    # [S, Ns, F]
    neigh: np.ndarray        # [S, Ns, D] int32 into [0, Ns+S*Hp)
    neigh_rel: np.ndarray    # [S, Ns, D, 5] int32
    neigh_mask: np.ndarray   # [S, Ns, D] f32
    halo_ids: np.ndarray     # [S, S*Hp] int32 global ids (padding -> 0)
    halo_mask: np.ndarray    # [S, S*Hp] f32
    send_ids: np.ndarray     # [S, S, Hp] int32 local rows to send to dest d
    node_mask: np.ndarray    # [S, Ns] f32
    node_conn: np.ndarray    # [S, Ns] f32
    node_tiny: np.ndarray    # [S, Ns] f32
    node_mol: np.ndarray     # [S, Ns] int32 graph segment id (padding -> G)
    # compact halo-edge COO table (overlap mode): the few ELL slots whose
    # source is remote, flattened to [Eh] entries sorted by dst row.  The
    # local einsum then has NO data dependence on the all_to_all, so XLA's
    # latency-hiding scheduler runs the exchange concurrently with it;
    # only this tiny tail (halo fraction ~0.1-1% of edges) waits.
    halo_edge_dst: np.ndarray   # [S, Eh] int32 local row
    halo_edge_slot: np.ndarray  # [S, Eh] int32 ELL slot d
    halo_edge_src: np.ndarray   # [S, Eh] int32 into the halo buffer [0,S*Hp)
    halo_edge_mask: np.ndarray  # [S, Eh] f32

    @property
    def num_shards(self) -> int:
        return self.node_feat.shape[0]

    @property
    def nodes_per_shard(self) -> int:
        return self.node_feat.shape[1]

    @property
    def halo_size(self) -> int:
        return self.halo_ids.shape[1]

    def halo_bytes_per_exchange(self, dtype_bytes: int = 4) -> dict:
        """Bytes each shard moves per halo exchange: packed all_to_all vs
        the all-gather fallback (the VERDICT 'bytes moved ∝ halo size'
        accounting)."""
        s, ns, f = self.node_feat.shape
        hp = self.send_ids.shape[2]
        real = float(self.halo_mask.sum()) / s
        return {
            "packed_bytes": s * hp * f * dtype_bytes,
            "allgather_bytes": s * ns * f * dtype_bytes,
            "real_halo_rows_mean": real,
            "pad_overhead": (s * hp) / max(real, 1.0),
        }


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
    # per (receiver s, owner o): sorted list of global ids s needs from o
    need = [[[] for _ in range(n_shards)] for _ in range(n_shards)]
    for s in range(n_shards):
        lo, hi = s * ns, (s + 1) * ns
        remote = set()
        for i in range(lo, min(hi, n)):
            for d in range(deg[i]):
                src = int(neigh_g[i, d])
                if owner(src) != s:
                    remote.add(src)
        for v in sorted(remote):
            need[s][owner(v)].append(v)
    # fixed per-owner segment width: max rows any (receiver, owner) pair
    # exchanges — the all_to_all block size
    hp = max((len(need[s][o]) for s in range(n_shards)
              for o in range(n_shards)), default=0)
    hp = max(hp, 1)

    S = n_shards
    all_feat = np.concatenate([gr.atom_features for gr in graphs])
    feat = np.zeros((S, ns, all_feat.shape[1]), np.float32)
    neigh = np.zeros((S, ns, max_degree), np.int32)
    rels = np.zeros((S, ns, max_degree, 5), np.int32)
    nmask = np.zeros((S, ns, max_degree), np.float32)
    halo_ids = np.zeros((S, S * hp), np.int32)
    halo_mask = np.zeros((S, S * hp), np.float32)
    send_ids = np.zeros((S, S, hp), np.int32)
    node_mask = np.zeros((S, ns), np.float32)
    node_tiny = np.zeros((S, ns), np.float32)
    node_mol = np.full((S, ns), len(graphs), np.int32)

    halo_edges = [[] for _ in range(S)]   # per shard: (dst row, slot, src)

    for s in range(S):
        lo = s * ns
        cnt = min(ns, n - lo) if lo < n else 0
        feat[s, :cnt] = all_feat[lo:lo + cnt]
        node_mask[s, :cnt] = 1.0
        node_mol[s, :cnt] = mol_of[lo:lo + cnt]
        # halo layout: S owner segments of hp slots each; slot k of segment
        # o holds need[s][o][k] — exactly what owner o packs for us at
        # send_ids[o, s, k], so the all_to_all result needs no permutation
        remote_index = {}
        for o in range(S):
            for k, v in enumerate(need[s][o]):
                slot = o * hp + k
                remote_index[v] = ns + slot
                halo_ids[s, slot] = v
                halo_mask[s, slot] = 1.0
                send_ids[o, s, k] = v - o * ns
        for i in range(cnt):
            gidx = lo + i
            # tiny mass: own molecule's (n_mol - deg) * 1e-9, identical to
            # the GraphBatcher (data/batching.py)
            node_tiny[s, i] = (mol_n[gidx] - deg[gidx]) * TINY
            for d in range(deg[gidx]):
                src = int(neigh_g[gidx, d])
                if owner(src) == s:
                    neigh[s, i, d] = src - lo
                else:
                    buf_idx = remote_index[src]
                    neigh[s, i, d] = buf_idx
                    halo_edges[s].append((i, d, buf_idx - ns))
                rels[s, i, d] = rel_g[gidx, d]
                nmask[s, i, d] = 1.0

    eh = max(max((len(h) for h in halo_edges), default=0), 1)
    he_dst = np.zeros((S, eh), np.int32)
    he_slot = np.zeros((S, eh), np.int32)
    he_src = np.zeros((S, eh), np.int32)
    he_mask = np.zeros((S, eh), np.float32)
    for s in range(S):
        for k, (i, d, hsrc) in enumerate(halo_edges[s]):  # already dst-sorted
            he_dst[s, k] = i
            he_slot[s, k] = d
            he_src[s, k] = hsrc
            he_mask[s, k] = 1.0

    node_conn = (nmask.sum(-1) > 0).astype(np.float32)
    return PartitionedGraph(
        node_feat=feat, neigh=neigh, neigh_rel=rels, neigh_mask=nmask,
        halo_ids=halo_ids, halo_mask=halo_mask, send_ids=send_ids,
        node_mask=node_mask,
        node_conn=node_conn, node_tiny=node_tiny, node_mol=node_mol,
        halo_edge_dst=he_dst, halo_edge_slot=he_slot, halo_edge_src=he_src,
        halo_edge_mask=he_mask,
    )


# --------------------------------------------------------------------------
# device path (inside shard_map over the 'graph' axis)
# --------------------------------------------------------------------------

def halo_exchange(x_local: jnp.ndarray, halo_ids: jnp.ndarray,
                  axis_name: str = "graph") -> jnp.ndarray:
    """All-gather fallback: gathers the WHOLE sharded feature array over ICI
    and takes this shard's needed rows.  x_local [Ns, F] -> halo [S*Hp, F].
    Moves S*Ns*F floats regardless of halo size — use
    `halo_exchange_packed` (default in EllHaloOps) unless measuring."""
    xg = jax.lax.all_gather(x_local, axis_name)      # [S, Ns, F]
    flat = xg.reshape(-1, x_local.shape[-1])          # [S*Ns, F]
    return flat[halo_ids]


def halo_exchange_packed(x_local: jnp.ndarray, send_ids: jnp.ndarray,
                         axis_name: str = "graph") -> jnp.ndarray:
    """Packed halo exchange: each shard ships only the rows its peers
    actually reference.  x_local [Ns, F], send_ids [S, Hp] (rows destined
    to each receiver) -> halo [S*Hp, F] grouped by owner segment — the
    layout `PartitionedGraph.neigh` indexes directly.

    Bytes per shard: S*Hp*F (∝ halo size) vs S*Ns*F for the all-gather
    fallback; at the 0.1-0.9% halo fractions of the locality-window stress
    graphs this is a ~100x traffic reduction per layer."""
    packed = x_local[send_ids]                        # [S, Hp, F]
    recv = jax.lax.all_to_all(
        packed, axis_name, split_axis=0, concat_axis=0, tiled=True
    )                                                 # [S, Hp, F] by owner
    return recv.reshape(-1, x_local.shape[-1])        # [S*Hp, F]


def halo_edge_attention_aggregate(
    part_local,                      # PartitionedGraph leaves w/o shard axis
    x_local: jnp.ndarray,            # [Ns, F]
    att_w: jnp.ndarray,              # [C] attention dictionary for one view
    self_r: jnp.ndarray,             # scalar
    rel_col: int = 0,
    axis_name: str = "graph",
    packed: bool = True,
) -> jnp.ndarray:
    """One edge-attention SpMM over the partitioned graph: identical math to
    the single-device view block (`models/layers.py`), sources resolved
    through the halo buffer."""
    if packed:
        halo = halo_exchange_packed(x_local, part_local.send_ids, axis_name)
    else:
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


def make_partitioned_spmm(mesh, att_dim: int, rel_col: int = 0,
                          packed: bool = True):
    """Builds the jitted shard_map'd multi-shard SpMM:
    (part [S,...], x [S,Ns,F], att_w [C], self_r) -> out [S,Ns,F]."""
    from jax.sharding import PartitionSpec as P

    def per_shard(part, x, att_w, self_r):
        local_part = jax.tree_util.tree_map(lambda a: a[0], part)
        out = halo_edge_attention_aggregate(
            local_part, x[0], att_w, self_r, rel_col, packed=packed
        )
        return out[None]

    return jax.jit(jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("graph"), P("graph"), P(), P()),
        out_specs=P("graph"),
        check_vma=False,
    ))
