"""Round-3 benchmark training queue (serialized TPU work).

Runs the missing RESULTS.md rows end-to-end with the reference
hyperparameters (`eagcn_pytorch/train.py:61-114`), committing artifacts
under runs/: HIV Concate, Lipo Concate, Tox21 Weighted_sum, Freesolv
Weighted_sum.  Each run writes <out>/<name>.jsonl + .log; the final
metric line also lands in runs/ROUND3_SUMMARY.json.

Run: python scripts/run_tpu_benchmarks.py [names...]
     (default: all four; pass a subset to rerun selectively)
"""
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
    "hiv_concat_rs0": ("hiv", "Concate", 5),
    "lipo_concat_rs0_r3": ("lipo", "Concate", 5),
    "tox21_weighted_rs0": ("tox21", "Weighted_sum", 1),
    "freesolv_weighted_rs0_r3": ("freesolv", "Weighted_sum", 10),
}

SUMMARY = "/root/repo/runs/ROUND3_SUMMARY.json"


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
        cfg.train.checkpoint_every = 20   # multi-hour runs must survive
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
    print("queue done", time.ctime(), flush=True)


if __name__ == "__main__":
    main()
