"""Physics-guarded timing (utils/timing.py): measurements below the
bytes/HBM-peak floor must be re-measured and, if persistent, flagged
suspect — the round-4 postmortem guard (BENCH_r04 recorded a 1.02 ms
dense step whose relation tensors alone need >=0.9 ms of HBM time)."""

import time

import numpy as np

import jax.numpy as jnp

from eagcn_tpu.utils.timing import bytes_floor_s, guarded_time


def _fast_step(carry):
    return carry  # ~0 wall time per step


class TestGuardedTime:
    def test_plausible_measurement_is_ok(self):
        dt, status = guarded_time(_fast_step, (jnp.zeros(4),), steps=3,
                                  warmup=0, floor_s=0.0)
        assert status == "ok"
        assert dt >= 0.0

    def test_impossible_measurement_is_suspect(self):
        # floor of 10s/step can never be met by a no-op step
        logs = []
        dt, status = guarded_time(_fast_step, (jnp.zeros(4),), steps=2,
                                  warmup=0, floor_s=10.0, attempts=2,
                                  log=logs.append)
        assert status == "suspect"
        assert len(logs) == 3          # 2 attempt warnings + final verdict
        assert "SUSPECT" in logs[-1]

    def test_remeasure_recovers(self):
        # first attempt artificially fast, second sleeps past the floor:
        # the guard should retry and return ok
        calls = {"n": 0}

        def step(carry):
            calls["n"] += 1
            if calls["n"] > 2:         # warmup=0, steps=2: second attempt
                time.sleep(0.02)
            return carry

        dt, status = guarded_time(step, (jnp.zeros(2),), steps=2, warmup=0,
                                  floor_s=0.02, attempts=3)
        assert status == "ok"
        assert dt >= 0.01

    def test_bytes_floor(self):
        assert bytes_floor_s(None) == 0.0
        assert bytes_floor_s(0) == 0.0
        # 819 GB at 819 GB/s = 1 s
        np.testing.assert_allclose(bytes_floor_s(819e9), 1.0)
