"""One-off: the 250k-node stress rung compiles to a SINGLE-chunk program
(default chunk_target 1<<19 > 250k nodes) and that monolithic variant
crashes the remote compile helper deterministically, while the chunked
(scan) variants at 1M/2.5M nodes compile fine.  Re-run the rung with
chunk_target 1<<17 (C=2 chunks -> same scan structure as the big rungs)
and patch the row into SCALING_r5.json."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp

from eagcn_tpu.data.synthetic import giant_graph
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.ops.giant import giant_batch_from_graph
from eagcn_tpu.train import make_optimizer, make_train_step
from eagcn_tpu.utils.config import ModelConfig
from eagcn_tpu.utils.timing import guarded_time, bytes_floor_s, program_bytes

OUT = "/root/repo/SCALING_r5.json"

cfg = ModelConfig(n_bfeat=20, sgc1=(40,) * 5, sgc2=(60,) * 5,
                  n_den1=128, n_den2=64, n_tasks=1, dropout=0.1,
                  structure="Concate", backend="ell", bf16=True,
                  remat=True)
tx = make_optimizer(1e-3, 0.0)
n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
g = giant_graph(5, n_nodes, avg_degree=4.0, n_bond_types=20, max_degree=8)
edges = 2 * g.num_bonds
CT = int(sys.argv[2]) if len(sys.argv) > 2 else (1 << 17)
rung = {"n_nodes": n_nodes, "n_directed_edges": edges,
        "chunk_target": CT}
batch = jax.tree_util.tree_map(
    jnp.asarray, giant_batch_from_graph(g, chunk_target=CT))
params, state = init_eagcn(jax.random.key(0), cfg)
opt = tx.init(params)
step = make_train_step(cfg, "reg", tx, split=False)
rng = jax.random.key(0, impl="rbg")
t0 = time.time()
compiled = step.lower(params, state, opt, batch, rng).compile()
print(f"compiled in {time.time()-t0:.0f}s", flush=True)
floor = bytes_floor_s(program_bytes(compiled))


def one(carry):
    p, s, o = carry
    p, s, o, loss = compiled(p, s, o, batch, rng)
    return (p, s, o)


dt, status = guarded_time(one, (params, state, opt), steps=10, warmup=1,
                          floor_s=floor, log=lambda m: print(m, flush=True))
ms = jax.devices()[0].memory_stats() or {}
rung.update({
    "ms_per_train_step": round(dt * 1e3, 2),
    "edges_per_s": round(edges / dt, 1),
    "physics_floor_ms": round(floor * 1e3, 2),
    "timing_status": status,
    "hbm_peak_bytes": ms.get("peak_bytes_in_use"),
    "note": "re-run with chunk_target 1<<17: the single-chunk default "
            "program crashed the remote compile helper",
})
print("rung:", rung, flush=True)
with open(OUT) as f:
    d = json.load(f)
runs = d["single_chip_stress"]["runs"]
for i, r in enumerate(runs):
    if r["n_nodes"] == n_nodes:
        runs[i] = rung
with open(OUT, "w") as f:
    json.dump(d, f, indent=2)
print("patched", OUT, flush=True)
