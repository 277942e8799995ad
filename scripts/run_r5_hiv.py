"""Round-5 HIV discrimination experiments (VERDICT r4, Missing #1).

The HIV gap (test AUC 0.777 best-val vs the chart's ≈0.83-0.84) has three
live suspects; these controlled runs discriminate them:

  1. `hiv_bnpad_rs0_r5`  — bn_count_padding=True: node-level BN statistics
     count B*batch-max-padding rows, the reference's padded-collate
     regularizer (`eagcn_pytorch/layers.py:394-412` over `utils.py:524`).
     If the overfit gap (train 0.970 / val 0.814 in r4) closes, the BN
     semantics divergence is the cause.
  2. `hiv_concat_rs1_r5` / `hiv_concat_rs2_r5` — plain config, seeds 1, 2:
     bounds selection noise (~140 val positives make single-seed best-val
     selection noisy; chart bars carry unknown seed optimism).

Reference hyperparams `train.py:69-76`; all runs early-stop on the
reference's best-30 rule.  Run: python scripts/run_r5_hiv.py [names...]
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
    # name: (random_state, bn_count_padding)
    "hiv_bnpad_rs0_r5": (0, True),
    "hiv_concat_rs1_r5": (1, False),
    "hiv_concat_rs2_r5": (2, False),
}

SUMMARY = "/root/repo/runs/ROUND5_HIV_SUMMARY.json"


def main():
    names = sys.argv[1:] or list(RUNS)
    summary = {}
    if os.path.exists(SUMMARY):
        with open(SUMMARY) as f:
            summary = json.load(f)
    for name in names:
        rs, bnpad = RUNS[name]
        print(f"=== {name} (rs={rs} bnpad={bnpad}) {time.ctime()} ===",
              flush=True)
        cfg = benchmark_config("hiv", structure="Concate", random_state=rs)
        cfg.model.bn_count_padding = bnpad
        cfg.out_dir = "/root/repo/runs"
        cfg.train.eval_every_epochs = 1
        cfg.train.checkpoint_every = 20
        t0 = time.time()
        try:
            exp = Experiment(cfg, run_name=name,
                             checkpoint_dir=f"/root/repo/runs/ckpt_{name}")
            res = exp.run(resume=True)
            res["wall_s"] = round(time.time() - t0, 1)
            res["bn_count_padding"] = bnpad
            res["random_state"] = rs
            summary[name] = res
            print(f"FINAL {name}", json.dumps(res, default=float), flush=True)
        except Exception:
            traceback.print_exc()
            summary[name] = {"error": traceback.format_exc()[-500:]}
        with open(SUMMARY, "w") as f:
            json.dump(summary, f, indent=2, default=float)
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
