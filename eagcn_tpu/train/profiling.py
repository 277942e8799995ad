"""Profiling & roofline helpers.

The reference has no profiling at all (SURVEY §5).  Here:
  * `trace_steps` captures a jax.profiler trace of a few real training
    steps (viewable in TensorBoard/XProf)
  * `step_cost` computes analytic FLOP / byte counts for the edge-attention
    message-passing step so measured step times convert to roofline
    utilization (the BASELINE.json "SpMM/SDDMM roofline per chip" metric)
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import numpy as np


def trace_steps(exp, out_dir: str, n_steps: int = 5) -> None:
    """Runs a few compiled train steps under the profiler."""
    from ..data import batch_to_jax, iter_batches

    it = iter_batches(exp.ds, exp.train_idx, exp.batch_shape)
    batch = batch_to_jax(next(it))
    def run_step(i):
        # Experiment's single-device step takes (..., rng, step_id)
        # (fold_step=True, steps.make_train_step); the DP step takes a
        # pre-folded key
        if exp.n_shards > 1:
            return exp.train_step(
                exp.params, exp.state, exp.opt_state, batch,
                jax.random.key(i))
        return exp.train_step(
            exp.params, exp.state, exp.opt_state, batch,
            exp.drop_key, np.uint32(i))

    # compile outside the trace
    p, s, o, _ = run_step(0)
    jax.block_until_ready(p)
    exp.params, exp.state, exp.opt_state = p, s, o
    with jax.profiler.trace(out_dir):
        for i in range(n_steps):
            exp.params, exp.state, exp.opt_state, loss = run_step(i + 1)
        jax.block_until_ready(loss)


def step_cost(batch, widths, n_views: int = 5) -> Dict[str, float]:
    """Analytic cost of one forward pass over a packed batch.

    widths: list of (f_in, f_out_per_view) per layer.  Returns flops and
    bytes for the aggregation (gather+reduce) and projection (matmul)
    stages; backward ~2x forward."""
    n_real = float(np.asarray(batch.node_mask).sum())
    e_real = float(np.asarray(batch.edge_mask).sum())
    d = batch.neigh.shape[1]
    flops = bytes_ = 0.0
    for f_in, f_out in widths:
        # aggregation: per view, per edge: multiply-add over f_in
        flops += n_views * 2.0 * e_real * f_in
        # gather traffic: one shared feature read of [N, D, f_in]
        bytes_ += 4.0 * n_real * d * f_in
        # projection: per view matmul
        flops += n_views * 2.0 * n_real * f_in * f_out
        bytes_ += n_views * 4.0 * (n_real * (f_in + f_out) + f_in * f_out)
    return {"flops": flops, "bytes": bytes_}


def measure(fn, *args, warmup: int = 2, iters: int = 10) -> float:
    """Median wall time of a jitted callable."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
