"""One-process TPU pipeline: perf probes + benchmark trainings.

Runs everything sequentially in a single interpreter because this
environment's TPU claim handshake costs many minutes per process; within a
warm process each additional program compiles in seconds.  Stages are
wrapped in SIGALRM watchdogs that SKIP (clean python exception, no process
kill) so one stuck stage cannot poison the device claim for the rest."""

import sys

sys.path.insert(0, "/root/repo")

import json
import signal
import time

t0 = time.time()


def t(m):
    print(f"{time.time()-t0:7.1f}s {m}", flush=True)


class StageTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise StageTimeout()


signal.signal(signal.SIGALRM, _alarm)


def stage(name, seconds, fn):
    t(f"--- stage {name} (budget {seconds}s)")
    signal.alarm(seconds)
    try:
        fn()
        t(f"--- stage {name} done")
    except StageTimeout:
        t(f"--- stage {name} TIMED OUT, skipping")
    except Exception as e:
        t(f"--- stage {name} FAILED: {type(e).__name__}: {e}")
    finally:
        signal.alarm(0)


import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    tt = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - tt) / n


# ----------------------------------------------------------------- probes
def probes():
    import bench
    from eagcn_tpu.models import apply_eagcn, init_eagcn
    from eagcn_tpu.train import make_optimizer, make_train_step

    cfg, graphs, labels, batch, real_edges = bench.build_workload()
    params, state = init_eagcn(jax.random.key(0), cfg.model)

    fwd = jax.jit(lambda p, s, b: apply_eagcn(p, s, b, cfg.model,
                                              train=False)[0])
    dt = timeit(fwd, params, state, batch)
    t(f"eval fwd (one-hot scores): {dt*1e3:.2f} ms")

    tx = make_optimizer(5e-4, 1e-4)
    opt_state = tx.init(params)
    cw = np.ones((12, 2), np.float32)
    step = make_train_step(cfg.model, "class", tx, cw)
    key = jax.random.key(1)

    def one(carry):
        p, s, o = carry
        p, s, o, loss = step(p, s, o, batch, key)
        return (p, s, o)

    dt = timeit(one, (params, state, opt_state))
    t(f"FULL train step: {dt*1e3:.2f} ms -> {real_edges/dt/1e6:.2f}M edges/s")

    # dense reference-algorithm baseline
    eps_d, dt_d, _status = bench.bench_dense(cfg, graphs, labels, real_edges)
    t(f"dense baseline step: {dt_d*1e3:.2f} ms -> {eps_d/1e6:.2f}M edges/s "
      f"(speedup {(real_edges/dt)/eps_d:.1f}x)")


# -------------------------------------------------------------- trainings
def train_one(name, dsn, arch="Concate", every=5):
    from eagcn_tpu.train import Experiment
    from eagcn_tpu.utils import benchmark_config

    cfg = benchmark_config(dsn, structure=arch)
    cfg.out_dir = "/root/repo/runs"
    cfg.train.eval_every_epochs = every
    exp = Experiment(cfg, run_name=name)
    res = exp.run(resume=False)
    print(f"FINAL_JSON {name} " + json.dumps(res, default=float), flush=True)
    exp.dump_representations("/root/repo/runs")


stage("lipo", 3600, lambda: train_one("lipo_tpu_rs0", "lipo", every=5))
stage("tox21_weighted", 2400,
      lambda: train_one("tox21_weighted_tpu_rs0", "tox21", "Weighted_sum",
                        every=1))
stage("hiv", 7200, lambda: train_one("hiv_tpu_rs0", "hiv", every=2))
stage("probes", 1800, probes)
t("pipeline complete")
