"""Benchmark harness.

Measures aggregated edge throughput (directed edges/sec) of the flagship
4-layer 5-view EAGCN **training step** (forward + backward + Adam + BN
state) on one chip, on a packed static mega-graph batch at Tox21-class
widths, and compares against a faithful JAX port of the REFERENCE
algorithm: dense per-batch-padded B x N x N adjacency with five one-hot
C x N x N relation tensors and batched dense matmuls
(`eagcn_pytorch/layers.py:38-95`, `utils.py:504-640`) — the same math on
the same hardware, so `vs_baseline` isolates the architectural win
(sparse mega-graph vs dense padding), not a hardware difference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}
Extra diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

# persistent compilation cache: the remote-compile path of this environment
# takes minutes per program; cache hits make repeat runs fast
try:
    import os as _os

    _cache = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                           ".jax_cache")
    _os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# workload construction
# --------------------------------------------------------------------------

N_MOLS = 8192              # ~850k directed edges: compute-bound, not dispatch
DENSE_MOLS = (256, 2048)   # dense reference baseline: measured at both and
                           # scored at its best PLAUSIBLE per-edge
                           # throughput (rows violating the bytes/HBM-peak
                           # physics floor are logged and discarded)
MEAN_ATOMS = 25.0
N_BOND_TYPES = 22          # tox21-like TypeAtt channel count
WARMUP, STEPS = 3, 20


def build_workload(n_mols: int = N_MOLS, backend: str = "pallas"):
    from eagcn_tpu.data.batching import (
        BatchShape, GraphBatcher, batch_to_jax, pick_tile_size,
    )
    from eagcn_tpu.data.synthetic import random_molecule_set
    from eagcn_tpu.utils.config import benchmark_config

    cfg = benchmark_config("tox21")
    cfg.model.n_bfeat = N_BOND_TYPES
    cfg.model.backend = backend
    # remat measured a 1.4x slowdown at this workload and the no-remat
    # step fits comfortably in HBM with the bf16 pipeline; pass "remat"
    # to re-enable for memory-limited sweeps
    cfg.model.remat = backend in ("tile", "pallas") and "remat" in sys.argv
    cfg.model.bf16 = True     # production precision: bf16 flows, f32 accum
    graphs, labels = random_molecule_set(
        0, n_mols, mean_atoms=MEAN_ATOMS, n_bond_types=N_BOND_TYPES,
        n_tasks=cfg.model.n_tasks,
    )
    labels = (labels > 0).astype(np.float32)
    nodes = sum(g.num_atoms for g in graphs)
    edges = sum(2 * g.num_bonds for g in graphs)
    tile = pick_tile_size(max(g.num_atoms for g in graphs)) \
        if backend in ("tile", "pallas") else 0
    align = max(128, tile)
    if tile:
        # exact: simulate the aligned placement cursor
        from eagcn_tpu.data.batching import _advance_aligned

        cursor = 0
        for g in graphs:
            cursor = _advance_aligned(cursor, g.num_atoms, tile) + g.num_atoms
        node_budget = cursor + 8
    else:
        node_budget = nodes + 8
    shape = BatchShape(
        num_nodes=-(-node_budget // align) * align,
        num_edges=-(-(edges + 8) // 128) * 128,
        num_mols=n_mols,
        tile_size=tile,
    )
    batch = GraphBatcher(shape).pack(graphs, labels, list(range(n_mols)))
    return cfg, graphs, labels, batch_to_jax(batch), int(edges)


def time_steps(step_fn, init_carry, steps=STEPS, warmup=WARMUP,
               floor_s=0.0):
    """Guarded timing (see eagcn_tpu/utils/timing.py): any wall-clock
    below 0.5x the program's bytes/HBM-peak floor is re-measured and, if
    it persists, returned as the slowest observation — callers that want
    the status should use guarded_time directly."""
    from eagcn_tpu.utils.timing import guarded_time

    dt, _status = guarded_time(step_fn, init_carry, steps=steps,
                               warmup=warmup, floor_s=floor_s, log=log)
    return dt


# --------------------------------------------------------------------------
# ours: sparse mega-graph train step
# --------------------------------------------------------------------------

def bench_sparse(cfg, batch, real_edges):
    from eagcn_tpu.models import init_eagcn
    from eagcn_tpu.train import make_optimizer, make_train_step
    from eagcn_tpu.utils.timing import bytes_floor_s, guarded_time

    params, state = init_eagcn(jax.random.key(0), cfg.model)
    tx = make_optimizer(5e-4, 1e-4)
    opt_state = tx.init(params)
    cw = np.ones((cfg.model.n_tasks, 2), np.float32)
    step = make_train_step(cfg.model, "class", tx, cw)
    rng = jax.random.key(1, impl="rbg")  # hardware-cheap dropout bits

    # analytic physics floor (conservative UNDER-estimate): the train step
    # must at least read the int8 tile tables twice (fwd + bwd score
    # recompute) and move each layer's output activations twice (write
    # fwd, read bwd) at compute width.  XLA's full cost-model number for
    # this workload is ~25x larger (110.8 GB, runs/roofline_r4.json) —
    # this loose bound exists to reject catastrophic tunnel-timing flakes
    # (0.5-2 ms "measurements"), not to certify efficiency.  The default
    # step is the SPLIT two-program pair (not a single jit), and
    # AOT-lowering a copy just for cost analysis would trigger a second
    # ~30-min remote compile of the same HLO (the persistent cache does
    # not hold the big programs here), so the analytic bound is the trade.
    from eagcn_tpu.models.eagcn import layer_widths

    widths, _, _ = layer_widths(cfg.model)
    act = 2 if cfg.model.bf16 else 4
    n = batch.node_feat.shape[0]
    act_bytes = float(sum(n * sum(outs) * act for _, outs in widths))
    tile_bytes = float(batch.tile_adj.size + batch.tile_rel.size
                       if batch.tile_adj.size else batch.neigh.size * 4)
    floor = bytes_floor_s(2.0 * (act_bytes + tile_bytes))
    log(f"sparse step physics floor (loose analytic): {floor*1e3:.2f} ms")

    def one(carry):
        p, s, o = carry
        p, s, o, loss = step(p, s, o, batch, rng)
        return (p, s, o)

    dt, status = guarded_time(one, (params, state, opt_state),
                              steps=STEPS, warmup=WARMUP, floor_s=floor,
                              log=log)
    return real_edges / dt, dt, status


# --------------------------------------------------------------------------
# baseline: dense reference algorithm (B x N x N padding) on same chip
# --------------------------------------------------------------------------

def build_dense_batch(graphs, labels):
    """Reference collate: pad everything to the batch max molecule size
    (`utils.py:575-640`)."""
    from eagcn_tpu.chem import dense_relation_tensors

    B = len(graphs)
    N = max(g.num_atoms for g in graphs)
    adj = np.zeros((B, N, N), np.float32)
    afm = np.zeros((B, N, graphs[0].atom_features.shape[1]), np.float32)
    rels = [np.zeros((B, c, N, N), np.float32)
            for c in (N_BOND_TYPES, 4, 2, 2, 2)]
    for b, g in enumerate(graphs):
        n = g.num_atoms
        a, t, o, ar, cj, rg = dense_relation_tensors(g, N_BOND_TYPES)
        adj[b, :n, :n] = a
        afm[b, :n] = g.atom_features
        for dst, src in zip(rels, (t, o, ar, cj, rg)):
            dst[b, :, :n, :n] = src
    return (jnp.asarray(adj), jnp.asarray(afm),
            [jnp.asarray(r) for r in rels], jnp.asarray(labels))


def init_dense_params(key, cfg):
    """Same architecture/widths as the sparse flagship."""
    widths = []
    f_in = cfg.model.n_afeat
    sgc = [cfg.model.sgc1, cfg.model.sgc2,
           tuple(2 * w for w in cfg.model.sgc2),
           tuple(2 * w for w in cfg.model.sgc2)]
    n_rels = (N_BOND_TYPES, 4, 2, 2, 2)
    params = {"layers": []}
    for li in range(4):
        layer = []
        for v in range(5):
            key, k1, k2 = jax.random.split(key, 3)
            layer.append({
                "att": jax.random.uniform(k1, (n_rels[v],), jnp.float32, -0.2, 0.2),
                "w": 0.02 * jax.random.normal(k2, (f_in, sgc[li][v])),
                "b": jnp.zeros((sgc[li][v],)),
                "self_r": jnp.zeros(()),
                "bn_scale": jnp.ones((sgc[li][v],)),
                "bn_bias": jnp.zeros((sgc[li][v],)),
            })
        params["layers"].append(layer)
        f_in = sum(sgc[li])
    key, k1, k2, k3 = jax.random.split(key, 4)
    params["den1"] = 0.05 * jax.random.normal(k1, (f_in, cfg.model.n_den1))
    params["den2"] = 0.05 * jax.random.normal(k2, (cfg.model.n_den1, cfg.model.n_den2))
    params["den3"] = 0.05 * jax.random.normal(k3, (cfg.model.n_den2, cfg.model.n_tasks))
    return params


def dense_forward(params, adj, afm, rels, train=True):
    """Reference math, dense: per view A1 = Conv1x1(rel); A = sigmoid*adj +
    sigmoid(self_r)I mask + tiny; rownorm; bmm; BN; relu (`layers.py:81-95`,
    `:293-325`); concat fusion; sum readout; MLP head.  Matmuls run in bf16
    with fp32 accumulation — the SAME precision budget as our sparse path,
    so vs_baseline isolates the architecture, not the dtype."""
    B, N, _ = adj.shape
    eye = jnp.eye(N)[None]
    mask2 = (adj.max(2, keepdims=True) > 0).astype(jnp.float32)
    tiny = (1.0 - adj) * 1e-9
    bf = jnp.bfloat16
    x = afm
    for layer in params["layers"]:
        outs = []
        for v, blk in enumerate(layer):
            a1 = jnp.einsum("c,bcij->bij", blk["att"], rels[v])
            a = jax.nn.sigmoid(a1) * adj + jax.nn.sigmoid(blk["self_r"]) * eye * mask2 + tiny
            a = a / a.sum(2, keepdims=True) * mask2
            h = jnp.einsum("bij,bjf->bif", a.astype(bf), x.astype(bf),
                           preferred_element_type=jnp.float32)
            h = jnp.einsum("bif,fo->bio", h.astype(bf),
                           blk["w"].astype(bf),
                           preferred_element_type=jnp.float32) + blk["b"]
            mean = h.mean((0, 1))
            var = h.var((0, 1))
            h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * blk["bn_scale"] + blk["bn_bias"]
            outs.append(jax.nn.relu(h))
        x = jnp.concatenate(outs, axis=-1) * mask2
    mol = x.sum(1)
    h = jax.nn.relu(mol @ params["den1"])
    h = jax.nn.relu(h @ params["den2"])
    return h @ params["den3"]


def bench_dense(cfg, graphs, labels, n_mols):
    """Dense reference-algorithm baseline (per-batch-max padding, the
    reference collate).  Throughput is normalized per edge, so the
    comparison is size-fair; main() takes the best over batch sizes."""
    graphs, labels = graphs[:n_mols], labels[:n_mols]
    real_edges = sum(2 * g.num_bonds for g in graphs)
    adj, afm, rels, y = build_dense_batch(graphs, labels)
    log(f"dense batch: adj {adj.shape}, rel tensors "
        f"{[tuple(r.shape) for r in rels]}")
    params = init_dense_params(jax.random.key(0), cfg)
    tx = optax.chain(optax.scale_by_adam(eps=1e-8), optax.scale(-5e-4))
    opt_state = tx.init(params)

    def loss_fn(p, adj, afm, rels, y):
        out = dense_forward(p, adj, afm, rels)
        return jnp.mean((out - y) ** 2)

    # batch rides as ARGUMENTS: captured closures become HLO literal
    # constants (B=2048 built a >400MB program that the remote compiler
    # rejects outright)
    @jax.jit
    def one(carry, adj, afm, rels, y):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, adj, afm, rels, y)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o)

    from eagcn_tpu.utils.timing import (V5E_HBM_GBPS, bytes_floor_s,
                                        guarded_time, program_bytes)

    # analytic fallback floor: fwd+bwd each read the five relation
    # tensors at least once (the att-grad SDDMM needs them again), so
    # 2x their fp32 bytes through HBM is a hard lower bound
    rel_bytes = sum(float(np.prod(r.shape)) * 4 for r in rels)
    floor = 2.0 * rel_bytes / (V5E_HBM_GBPS * 1e9)
    run = one
    try:
        # AOT-compile once and time that executable (see bench_sparse)
        compiled = one.lower((params, opt_state), adj, afm, rels, y).compile()
        run = compiled
        floor = max(floor, bytes_floor_s(program_bytes(compiled)))
    except Exception as e:
        log(f"dense cost model unavailable ({type(e).__name__}) — "
            f"using analytic 2x-relation-bytes floor")
    log(f"dense B={len(graphs)} physics floor: {floor*1e3:.2f} ms")

    dt, status = guarded_time(lambda c: run(c, adj, afm, rels, y),
                              (params, opt_state), steps=STEPS,
                              warmup=WARMUP, floor_s=floor, log=log)
    return real_edges / dt, dt, status


def step_flops(cfg, batch, real_edges) -> float:
    """Analytic FLOPs of one train step (fwd + 2x bwd [+1x remat refwd])
    of the tile/pallas path — for the MFU/roofline diagnostic."""
    from eagcn_tpu.models.eagcn import layer_widths

    widths, _, _ = layer_widths(cfg.model)
    n = batch.node_feat.shape[0]
    if batch.tile_adj.size:
        tile_cells = float(batch.tile_adj.shape[0]) * batch.tile_adj.shape[1] ** 2
    else:
        tile_cells = float(batch.neigh.shape[0]) * batch.neigh.shape[1]
    fwd = 0.0
    for f_in, outs in widths:
        for f_out in outs:
            f_agg = min(f_in, f_out) if (cfg.model.pre_transform and
                                         max(outs) < f_in) else f_in
            fwd += 2.0 * tile_cells * f_agg          # aggregation matmul
            fwd += 2.0 * n * f_in * f_out            # projection matmul
    mult = 4.0 if cfg.model.remat else 3.0           # bwd 2x (+ remat refwd)
    return fwd * mult


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    cfg, graphs, labels, batch, real_edges = build_workload(backend=backend)
    n_nodes = int(np.asarray(batch.node_mask).sum())
    log(f"workload: {N_MOLS} mols, {n_nodes} atoms, {real_edges} directed edges, "
        f"packed shape nodes={batch.node_feat.shape[0]} edges={batch.edge_src.shape[0]} "
        f"tiles={batch.tile_adj.shape if batch.tile_adj.size else None}")
    log(f"device: {jax.devices()[0]}")

    sparse_eps, sparse_dt, sparse_status = bench_sparse(cfg, batch, real_edges)
    flops = step_flops(cfg, batch, real_edges)
    mfu = flops / sparse_dt / 197e12   # v5e bf16 peak 197 TFLOP/s
    log(f"{cfg.model.backend} mega-graph train step: {sparse_dt*1e3:.2f} ms -> "
        f"{sparse_eps/1e6:.2f}M edges/s "
        f"({flops/1e9:.0f} GFLOP/step, MFU {mfu*100:.1f}% of v5e bf16 peak)"
        + (" [SUSPECT]" if sparse_status != "ok" else ""))

    import signal

    def _timeout(signum, frame):
        raise TimeoutError("dense baseline exceeded time budget")

    dense_best = 0.0
    signal.signal(signal.SIGALRM, _timeout)
    for nd in DENSE_MOLS:
        try:
            # watchdog: the remote-compile path can take minutes; never let
            # the baseline hang the harness
            signal.alarm(900)
            dense_eps, dense_dt, status = bench_dense(cfg, graphs, labels, nd)
            signal.alarm(0)
            log(f"dense reference-algorithm step (B={nd}): "
                f"{dense_dt*1e3:.2f} ms -> {dense_eps/1e6:.2f}M edges/s"
                + (" [SUSPECT — excluded from baseline]"
                   if status != "ok" else ""))
            if status == "ok":
                dense_best = max(dense_best, dense_eps)
        except Exception as e:  # OOM on big dense tensors, compile timeout...
            signal.alarm(0)
            log(f"dense baseline (B={nd}) failed: {type(e).__name__}: {e}")
    # a suspect sparse measurement must never publish a vs_baseline win
    vs = sparse_eps / dense_best \
        if dense_best and sparse_status == "ok" else float("nan")

    print(json.dumps({
        "metric": "eagcn_train_step_edge_throughput",
        "value": round(sparse_eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(vs, 3) if np.isfinite(vs) else None,
    }))


if __name__ == "__main__":
    main()
