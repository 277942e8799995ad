"""HBM-roofline measurement for the flagship bench train step (round-3
verdict item 4: 'report the roofline you claim').

Uses XLA's own cost model (compiled.cost_analysis(): flops + bytes
accessed) on the EXACT program bench.py times, plus the measured step
time, to report achieved TFLOP/s, achieved GB/s, %MXU peak and %HBM peak
on the v5e chip.  Writes runs/roofline_r4.json.

v5e (TPU v5 lite) single-chip peaks: 197 TFLOP/s bf16, 819 GB/s HBM.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import bench
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.train import make_optimizer, make_train_step

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    n_mols = int(sys.argv[2]) if len(sys.argv) > 2 else bench.N_MOLS
    cfg, graphs, labels, batch, real_edges = bench.build_workload(
        n_mols=n_mols, backend=backend)
    params, state = init_eagcn(jax.random.key(0), cfg.model)
    tx = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    opt_state = tx.init(params)
    cw = jnp.ones((cfg.model.n_tasks, 2))
    step = make_train_step(cfg.model, "class", tx, cw, split=False,
                           fold_step=True)
    key = jax.random.key(0, impl="rbg")

    # `step` is already a jit; lower + compile it for XLA's cost analysis
    compiled = step.lower(
        params, state, opt_state, batch, key, np.uint32(0)).compile()
    cost = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        cost = {k: float(v) for k, v in ca.items()
                if k in ("flops", "bytes accessed", "transcendentals",
                         "optimal_seconds")
                or k.startswith("bytes accessed")}
    except Exception as e:  # pragma: no cover - remote backends may lack it
        print("cost_analysis unavailable:", e, flush=True)

    # measured step time (donation-safe: rebind carry each call)
    p, s, o = params, state, opt_state
    for i in range(3):
        p, s, o, loss = step(p, s, o, batch, key, np.uint32(i))
    jax.block_until_ready(loss)
    times = []
    for i in range(20):
        t0 = time.perf_counter()
        p, s, o, loss = step(p, s, o, batch, key, np.uint32(i + 3))
        jax.block_until_ready(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    analytic_flops = bench.step_flops(cfg, batch, real_edges)
    flops = cost.get("flops", analytic_flops)
    bytes_acc = cost.get("bytes accessed", float("nan"))

    out = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "step_ms": dt * 1e3,
        "edges_per_s": real_edges / dt,
        "xla_flops_per_step": flops,
        "analytic_flops_per_step": analytic_flops,
        "xla_bytes_per_step": bytes_acc,
        "achieved_tflops": flops / dt / 1e12,
        "mfu_pct_bf16": flops / dt / 1e12 / V5E_BF16_TFLOPS * 100,
        "achieved_gbps": bytes_acc / dt / 1e9,
        "hbm_util_pct": bytes_acc / dt / 1e9 / V5E_HBM_GBPS * 100,
        "peaks": {"bf16_tflops": V5E_BF16_TFLOPS,
                  "hbm_gbps": V5E_HBM_GBPS},
    }
    print(json.dumps(out, indent=2), flush=True)
    with open("/root/repo/runs/roofline_r4.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
