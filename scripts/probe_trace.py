"""Round-2 probe #3: capture a jax.profiler trace of the full train-step
grad and print the top device ops by self-time.  Answers WHERE the 33 ms
goes (XLA gather lowering? transposes? BN? scan overhead?).

Run: python scripts/probe_trace.py [--what full|layer]
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
t0 = time.time()


def t(m):
    print(f"{time.time()-t0:6.1f}s {m}", flush=True)


import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import bench
from eagcn_tpu.models import apply_eagcn, init_eagcn
from eagcn_tpu.train.losses import weighted_bce_loss

cfg, graphs, labels, batch, real_edges = bench.build_workload()
t(f"workload built: {batch.node_feat.shape[0]} nodes")

params, state = init_eagcn(jax.random.key(0), cfg.model)
cw = jnp.ones((12, 2))
key = jax.random.key(0)


@jax.jit
def full_g(carry):
    p, k = carry
    k, sub = jax.random.split(k)

    def loss(pp):
        logits, _, _, ns = apply_eagcn(pp, state, batch, cfg.model,
                                       train=True, rng=sub)
        return weighted_bce_loss(logits, batch.labels, batch.mol_mask, cw)

    g = jax.grad(loss)(p)
    return (jax.tree.map(lambda a, b: a + 1e-12 * b, p, g), k)


carry = full_g((params, key))
jax.block_until_ready(carry)
t("compiled + warm")

TRACE_DIR = "/tmp/jaxtrace"
os.system(f"rm -rf {TRACE_DIR}")
jax.profiler.start_trace(TRACE_DIR)
for _ in range(10):
    carry = full_g(carry)
jax.block_until_ready(carry)
jax.profiler.stop_trace()
t("trace captured")

# ---- parse the trace: aggregate device-op self time by name
paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
t(f"trace files: {paths}")
agg = {}
total = 0.0
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    # find device track pids (TPU / device compute lanes)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower()
                or "Axon" in name}
    t(f"process names: {sorted(set(pid_names.values()))}")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur

top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
print(f"\n=== top device ops by total time over 10 steps (ms) ===")
for name, ms in top:
    print(f"{ms:9.2f} ms  {name[:120]}")
print(f"total tracked: {total:.1f} ms over 10 steps")
