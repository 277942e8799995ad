"""Characterize per-step dispatch cost over the remote-TPU tunnel and
re-test the fused / scanned train-step compiles (round-3 reported both as
compiler hangs; this measures rather than assumes).

Stages (pass a subset as argv to run selectively):
  async   : 200 split-step dispatches, block only at the end (the current
            production path) vs block-per-step -> isolates dispatch tax
  fused   : compile the single fused+donated train step (the round-3 "hang")
  scan    : compile lax.scan over K steps, then measure per-step time

Run each stage under `timeout` from the shell; a hang here must not wedge
the chip for the benchmark queue.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from eagcn_tpu.data.batching import (
    BatchShape, GraphBatcher, batch_to_jax,
)
from eagcn_tpu.data.synthetic import random_molecule_set
from eagcn_tpu.utils.config import benchmark_config
from eagcn_tpu.models import init_eagcn
from eagcn_tpu.train.steps import make_optimizer, make_train_step


def hiv_like_batch(n_mols=32, seed=0):
    cfg = benchmark_config("hiv")
    cfg.model.n_bfeat = 37
    cfg.model.backend = "ell"
    graphs, labels = random_molecule_set(
        seed, n_mols, mean_atoms=25, n_bond_types=37,
        n_tasks=cfg.model.n_tasks,
    )
    labels = (labels > 0).astype(np.float32)
    # HIV batch-32 budget from plan_batch_shape is ~1k nodes; use a fixed
    # static shape so every synthetic batch shares one executable
    shape = BatchShape(num_nodes=1152, num_edges=2560, num_mols=n_mols)
    b = GraphBatcher(shape).pack(graphs, labels, list(range(n_mols)))
    return cfg, batch_to_jax(b)


def main():
    stages = sys.argv[1:] or ["async"]
    cfg, batch = hiv_like_batch()
    t = cfg.train
    tx = make_optimizer(t.learning_rate, t.weight_decay)
    key = jax.random.key(0)
    params, state = init_eagcn(key, cfg.model)
    opt_state = tx.init(params)
    cw = np.array([[3.5, 0.16]], dtype=np.float32)
    drop_key = jax.random.key(1, impl="rbg")

    if "async" in stages:
        step = make_train_step(cfg.model, t.task_type, tx, cw, split=True)
        p, s, o = params, state, opt_state
        t0 = time.time()
        p, s, o, loss = step(p, s, o, batch, drop_key)
        jax.block_until_ready(loss)
        print(f"first split-step (compile+run): {time.time()-t0:.1f}s",
              flush=True)

        # block per step
        N = 100
        t0 = time.time()
        for i in range(N):
            p, s, o, loss = step(p, s, o, batch, drop_key)
            jax.block_until_ready(loss)
        dt_block = (time.time() - t0) / N
        print(f"split step, block each: {dt_block*1e3:.1f} ms/step")

        # async: block only at the end
        t0 = time.time()
        for i in range(N):
            p, s, o, loss = step(p, s, o, batch, drop_key)
        jax.block_until_ready(loss)
        dt_async = (time.time() - t0) / N
        print(f"split step, async     : {dt_async*1e3:.1f} ms/step")

        # async incl. fresh device_put of the batch each step (the real
        # loop re-puts a new packed batch every step)
        host_batch = jax.tree_util.tree_map(np.asarray, batch)
        t0 = time.time()
        for i in range(N):
            db = jax.tree_util.tree_map(jax.device_put, host_batch)
            p, s, o, loss = step(p, s, o, db, drop_key)
        jax.block_until_ready(loss)
        dt_put = (time.time() - t0) / N
        print(f"split step, async+put : {dt_put*1e3:.1f} ms/step")

        # per-step fold_in dispatch cost (the real loop folds global_step)
        t0 = time.time()
        for i in range(N):
            k = jax.random.fold_in(drop_key, i)
            db = jax.tree_util.tree_map(jax.device_put, host_batch)
            p, s, o, loss = step(p, s, o, db, k)
        jax.block_until_ready(loss)
        dt_full = (time.time() - t0) / N
        print(f"split step, full loop : {dt_full*1e3:.1f} ms/step")

    if "fused" in stages:
        step = make_train_step(cfg.model, t.task_type, tx, cw, split=False)
        t0 = time.time()
        p, s, o, loss = step(params, state, opt_state, batch, drop_key)
        jax.block_until_ready(loss)
        print(f"fused step compile+run: {time.time()-t0:.1f}s", flush=True)
        p, s, o, loss = step(p, s, o, batch, drop_key)
        N = 100
        t0 = time.time()
        for i in range(N):
            p, s, o, loss = step(p, s, o, batch, drop_key)
        jax.block_until_ready(loss)
        print(f"fused step, async: {(time.time()-t0)/N*1e3:.1f} ms/step")

    if "scan" in stages:
        from eagcn_tpu.train.steps import make_scan_step

        # fresh (possibly donated-away) training state for this stage
        params, state = init_eagcn(key, cfg.model)
        opt_state = tx.init(params)
        K = int(next((a for a in sys.argv[1:] if a.isdigit()), 8))
        scan_step = make_scan_step(cfg.model, t.task_type, tx, cw)
        host_batch = jax.tree_util.tree_map(np.asarray, batch)
        stacked = jax.tree_util.tree_map(
            lambda x: np.stack([x] * K), host_batch)
        step_ids = np.arange(K, dtype=np.uint32)
        t0 = time.time()
        p, s, o, losses = scan_step(
            params, state, opt_state,
            jax.tree_util.tree_map(jax.device_put, stacked),
            step_ids, drop_key)
        jax.block_until_ready(losses)
        print(f"scan K={K} compile+run: {time.time()-t0:.1f}s", flush=True)
        N = 20
        t0 = time.time()
        for i in range(N):
            p, s, o, losses = scan_step(
                p, s, o, jax.tree_util.tree_map(jax.device_put, stacked),
                step_ids, drop_key)
        jax.block_until_ready(losses)
        dt = (time.time() - t0) / (N * K)
        print(f"scan K={K}: {dt*1e3:.2f} ms/step ({dt*K*1e3:.1f} ms/dispatch)")


if __name__ == "__main__":
    main()
