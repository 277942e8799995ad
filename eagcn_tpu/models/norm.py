"""Masked batch normalization.

The reference's `AFM_BatchNorm` (`eagcn_pytorch/layers.py:394-412`) is a
torch BatchNorm1d over the feature axis of [B, N, F] activations whose
statistics COUNT the zero padding rows.  In a packed mega-graph the padding
fraction is a batch-shape constant rather than data, so eagcn_tpu computes
*masked* statistics (real atoms / real molecules only) — the mathematically
intended normalization; divergence documented in SURVEY §7.3 and asserted
in tests against a masked numpy oracle.

Semantics match torch BatchNorm1d otherwise: biased variance for
normalization, unbiased variance into the running estimate, momentum 0.1,
eps 1e-5 (torch defaults, used at `layers.py:399`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

BNParams = Dict[str, jnp.ndarray]
BNState = Dict[str, jnp.ndarray]

EPS = 1e-5
MOMENTUM = 0.1


def init_batch_norm(key: jax.Array, dim: int) -> Tuple[BNParams, BNState]:
    """gamma ~ N(1, 0.02), beta = 0 — the reference's `weights_init`
    (`eagcn_pytorch/utils.py:702-712`)."""
    params = {
        "scale": 1.0 + 0.02 * jax.random.normal(key, (dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }
    return params, state


def batch_norm_apply(
    params: BNParams,
    state: BNState,
    x: jnp.ndarray,          # [N, F]
    mask: jnp.ndarray,       # [N] 1.0 for rows that count
    train: bool,
    axis_name: str | None = None,
) -> Tuple[jnp.ndarray, BNState]:
    """Masked BN over the leading axis.  When `axis_name` is given, moments
    are psum'd over that mesh axis so sharded training normalizes with
    GLOBAL batch statistics (the reference is single-device; this is the
    multi-chip generalization)."""
    if train:
        m = mask[:, None]
        count = jnp.sum(mask)
        # x32: bf16 activations convert IN-REGISTER inside the reduction
        # fusions (no f32 materialization) — without this, x*x would round
        # to bf16 BEFORE the sum and bias the variance
        x32 = x.astype(jnp.float32)
        s1 = jnp.sum(x32 * m, axis=0)
        s2 = jnp.sum(x32 * x32 * m, axis=0)
        if axis_name is not None:
            count = jax.lax.psum(count, axis_name)
            s1 = jax.lax.psum(s1, axis_name)
            s2 = jax.lax.psum(s2, axis_name)
        count = jnp.maximum(count, 1.0)
        mean = s1 / count
        var = jnp.maximum(s2 / count - mean * mean, 0.0)
        unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
        new_state = {
            "mean": (1 - MOMENTUM) * state["mean"] + MOMENTUM * mean,
            "var": (1 - MOMENTUM) * state["var"] + MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + EPS)
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, new_state
