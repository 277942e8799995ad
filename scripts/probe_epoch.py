"""Instrument one real HIV training epoch: where do the milliseconds go?

Times, separately: host packing, device_put, dispatch, and the fully
pipelined loop (prefetch thread + async dispatch) — on the real dataset
with the real Experiment step. Run while the chip is otherwise idle.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from eagcn_tpu.data import batch_to_jax, iter_batches
from eagcn_tpu.train import Experiment
from eagcn_tpu.utils.config import benchmark_config
from eagcn_tpu.utils.logging import RunLogger


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    cfg = benchmark_config("hiv")
    cfg.train.eval_every_epochs = 1000
    exp = Experiment(cfg, logger=RunLogger(None, "probe", echo=False))
    print("batch shape:", exp.batch_shape, flush=True)

    # 1. pure host packing
    rng = np.random.default_rng([0, 0])
    t0 = time.time()
    batches = []
    for b in iter_batches(exp.ds, exp.train_idx, exp.batch_shape,
                          shuffle=True, rng=rng):
        batches.append(b)
        if len(batches) >= n_steps:
            break
    t_pack = (time.time() - t0) / len(batches)
    print(f"host pack            : {t_pack*1e3:6.1f} ms/batch", flush=True)

    # 2. device_put alone
    t0 = time.time()
    dev = [batch_to_jax(b) for b in batches[:100]]
    jax.block_until_ready(dev[-1].node_feat)
    print(f"device_put           : {(time.time()-t0)/100*1e3:6.1f} ms/batch",
          flush=True)

    # 3. dispatch on pre-transferred batches (compile first)
    p, s, o = exp.params, exp.state, exp.opt_state
    p, s, o, loss = exp.train_step(p, s, o, dev[0], exp.drop_key,
                                   np.uint32(0))
    jax.block_until_ready(loss)
    t0 = time.time()
    for i, db in enumerate(dev):
        p, s, o, loss = exp.train_step(p, s, o, db, exp.drop_key,
                                       np.uint32(i))
    jax.block_until_ready(loss)
    print(f"dispatch (cached put): {(time.time()-t0)/len(dev)*1e3:6.1f} ms/step",
          flush=True)

    # 4. dispatch + fresh put each step (no packing)
    t0 = time.time()
    for i, b in enumerate(batches[:100]):
        p, s, o, loss = exp.train_step(p, s, o, batch_to_jax(b),
                                       exp.drop_key, np.uint32(i))
    jax.block_until_ready(loss)
    print(f"dispatch + fresh put : {(time.time()-t0)/100*1e3:6.1f} ms/step",
          flush=True)

    # 5. the real loop path (prefetch thread + pack + put + dispatch)
    exp.params, exp.state, exp.opt_state = p, s, o
    t0 = time.time()
    n = 0
    from eagcn_tpu.train.loop import _prefetch
    src = iter_batches(exp.ds, exp.train_idx, exp.batch_shape,
                       shuffle=True, rng=np.random.default_rng([0, 1]))
    losses = []
    for b in _prefetch(src):
        losses.append(exp._run_one(b))
        n += 1
        if n >= n_steps:
            break
    jax.block_until_ready(losses[-1])
    print(f"full loop path       : {(time.time()-t0)/n*1e3:6.1f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
