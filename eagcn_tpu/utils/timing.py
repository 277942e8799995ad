"""Self-defending wall-clock measurement.

Round-4 postmortem: the benchmark harness recorded a dense train step at
1.02 ms whose relation tensors alone are ~764 MB/step — one forward read
needs >=0.9 ms at the v5e's 819 GB/s, so the number was physically
impossible (a tunnel-timing flake), yet it defined the round's
`vs_baseline`.  Every timing this package publishes now passes through
`guarded_time`, which

  1. forces a REAL device sync by fetching device data (not just
     block_until_ready, which the remote tunnel has mis-reported),
  2. checks the measured wall-clock against a physics floor — the
     program's XLA-cost-model bytes divided by the chip's peak HBM
     bandwidth — and re-measures anything faster than 0.5x that floor,
  3. returns a status: "ok" when plausible, "suspect" when every attempt
     violated the floor.  Suspect numbers must be recorded as suspect,
     never as results.

No reference counterpart (the reference publishes no timings); this is
harness infrastructure demanded by the BASELINE.json north star.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import numpy as np

import jax

# TPU v5 lite (v5e) single-chip peaks
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def program_bytes(compiled) -> float | None:
    """Total 'bytes accessed' from XLA's cost model for a compiled
    executable, or None when the backend doesn't expose it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        b = ca.get("bytes accessed")
        return float(b) if b else None
    except Exception:
        return None


def bytes_floor_s(nbytes: float | None,
                  hbm_gbps: float = V5E_HBM_GBPS) -> float:
    """Seconds the chip MUST spend just moving `nbytes` through HBM at
    peak bandwidth.  0.0 when bytes are unknown (guard disabled)."""
    if not nbytes:
        return 0.0
    return float(nbytes) / (hbm_gbps * 1e9)


def _hard_sync(carry) -> None:
    """Fetch device data so the host provably waited for execution.
    block_until_ready alone has produced impossible timings through the
    remote-device tunnel; a device_get cannot complete before the program
    that produced the array does (the carry chains every prior step)."""
    leaves = [l for l in jax.tree_util.tree_leaves(carry)
              if hasattr(l, "dtype")]
    if not leaves:
        return
    smallest = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(jax.device_get(smallest))


def guarded_time(
    step_fn: Callable,
    init_carry,
    steps: int = 20,
    warmup: int = 3,
    floor_s: float = 0.0,
    attempts: int = 3,
    log: Callable[[str], None] = lambda s: None,
) -> Tuple[float, str]:
    """Time `steps` iterations of `step_fn(carry) -> carry`, returning
    (seconds_per_step, status).  status == "ok" iff the measurement is at
    least 0.5x the physics floor; measurements below it are re-measured
    up to `attempts` times and, if they persist, the SLOWEST observed
    value is returned with status "suspect"."""
    carry = init_carry
    for _ in range(warmup):
        carry = step_fn(carry)
    jax.block_until_ready(carry)
    _hard_sync(carry)

    observed = []
    for attempt in range(attempts):
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = step_fn(carry)
        jax.block_until_ready(carry)
        _hard_sync(carry)
        dt = (time.perf_counter() - t0) / steps
        observed.append(dt)
        if dt >= 0.5 * floor_s:
            return dt, "ok"
        log(f"guarded_time: attempt {attempt+1} measured {dt*1e3:.3f} ms "
            f"< 0.5x physics floor {floor_s*1e3:.3f} ms "
            f"(bytes/HBM-peak) — re-measuring")
    worst = max(observed)
    log(f"guarded_time: ALL {attempts} attempts below the physics floor "
        f"{floor_s*1e3:.3f} ms (observed {[f'{d*1e3:.3f}' for d in observed]}"
        f" ms) — returning slowest as SUSPECT")
    return worst, "suspect"
