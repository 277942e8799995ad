"""Trace the EXACT step bench.py times (split grad/update pair, rbg
dropout keys) and print top device ops by self-time — the probe_trace.py
program uses threefry keys and a fused step, which overstates RNG cost.

Run: python scripts/trace_bench_step.py
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

import bench
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.train import make_optimizer, make_train_step

cfg, graphs, labels, batch, real_edges = bench.build_workload()
params, state = init_eagcn(jax.random.key(0), cfg.model)
tx = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
opt_state = tx.init(params)
cw = jnp.ones((cfg.model.n_tasks, 2))
step = make_train_step(cfg.model, "class", tx, cw)
rng = jax.random.key(1, impl="rbg")

p, s, o = params, state, opt_state
p, s, o, loss = step(p, s, o, batch, rng)
jax.block_until_ready(loss)
t0 = time.time()
for _ in range(5):
    p, s, o, loss = step(p, s, o, batch, rng)
jax.block_until_ready(loss)
print(f"warm step: {(time.time()-t0)/5*1e3:.1f} ms", flush=True)

TRACE_DIR = "/tmp/jaxtrace_bench"
os.system(f"rm -rf {TRACE_DIR}")
jax.profiler.start_trace(TRACE_DIR)
for _ in range(10):
    p, s, o, loss = step(p, s, o, batch, rng)
jax.block_until_ready(loss)
jax.profiler.stop_trace()

paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
agg = {}
total = 0.0
for pth in paths:
    with gzip.open(pth, "rt") as f:
        data = json.load(f)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()
                or "Axon" in name}
    if not dev_pids:
        print(f"WARNING: no device process matched in {sorted(pid_names.values())}; "
              "totals below INCLUDE HOST-THREAD events", flush=True)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        if name.isdigit():
            continue
        dur = ev.get("dur", 0) / 1e3
        agg[name] = agg.get(name, 0.0) + dur
        total += dur

print("\n=== top device ops, ms PER STEP (10-step avg) ===")
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:35]:
    print(f"{ms/10:8.2f} ms  {name[:120]}")
print(f"total tracked/step: {total/10:.1f} ms")
