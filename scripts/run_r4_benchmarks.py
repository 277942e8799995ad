"""Round-4 benchmark training queue (serialized TPU work).

Finishes the RESULTS.md parity table with the reference hyperparameters
(`eagcn_pytorch/train.py:61-114`): HIV Concate (300 ep), Lipo Concate
(500 ep), Tox21 Weighted_sum (100 ep), Freesolv Weighted_sum (1500 ep).
All four run fresh on the fused single-dispatch train step (fold_step,
steps.py) — ~7 ms/step over the tunnel vs ~40 ms in round 3, so the whole
queue fits in ~2 h.  HIV evaluates EVERY epoch so best-val selection is
not quantized to a 5-epoch grid (round-3 verdict, weak #2).

Run: python scripts/run_r4_benchmarks.py [names...]
     (default: all four; pass a subset to rerun selectively)
"""
import gc
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from eagcn_tpu.train import Experiment
from eagcn_tpu.utils.config import benchmark_config

RUNS = {
    # name: (dataset, structure, eval_every)
    "hiv_concat_rs0_r4": ("hiv", "Concate", 1),
    "lipo_concat_rs0_r4": ("lipo", "Concate", 1),
    "tox21_weighted_rs0_r4": ("tox21", "Weighted_sum", 1),
    "freesolv_weighted_rs0_r4": ("freesolv", "Weighted_sum", 5),
}

SUMMARY = "/root/repo/runs/ROUND4_SUMMARY.json"


def main():
    names = sys.argv[1:] or list(RUNS)
    summary = {}
    if os.path.exists(SUMMARY):
        with open(SUMMARY) as f:
            summary = json.load(f)
    for name in names:
        dataset, structure, every = RUNS[name]
        print(f"=== {name} ({dataset}/{structure}) {time.ctime()} ===",
              flush=True)
        cfg = benchmark_config(dataset, structure=structure)
        cfg.out_dir = "/root/repo/runs"
        cfg.train.eval_every_epochs = every
        cfg.train.checkpoint_every = 20   # long runs must survive kills
        t0 = time.time()
        try:
            exp = Experiment(cfg, run_name=name,
                             checkpoint_dir=f"/root/repo/runs/ckpt_{name}")
            res = exp.run(resume=True)
            res["wall_s"] = round(time.time() - t0, 1)
            summary[name] = res
            print(f"FINAL {name}", json.dumps(res, default=float), flush=True)
        except Exception:
            traceback.print_exc()
            summary[name] = {"error": traceback.format_exc()[-500:]}
        with open(SUMMARY, "w") as f:
            json.dump(summary, f, indent=2, default=float)
        # the queue OOM'd at 119 GB RSS after three datasets: host-side
        # dataset arrays + jit executables accumulate per Experiment.
        # Drop everything between runs and clear jax's live caches.
        try:
            del exp, res
        except NameError:
            pass
        gc.collect()
        jax.clear_caches()
        gc.collect()
    print("queue done", time.ctime(), flush=True)


if __name__ == "__main__":
    main()
