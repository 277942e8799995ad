"""Masked batch normalization.

The reference's `AFM_BatchNorm` (`eagcn_pytorch/layers.py:394-412`) is a
torch BatchNorm1d over the feature axis of [B, N, F] activations whose
statistics COUNT the zero padding rows.  In a packed mega-graph the padding
fraction is a batch-shape constant rather than data, so eagcn_tpu computes
*masked* statistics (real atoms / real molecules only) — the mathematically
intended normalization; divergence documented in SURVEY §7.3 and asserted
in tests against a masked numpy oracle.

For the parity A/B (PARITY.md item 2: the reference's padding-counting
stats act as a regularizer whose strength grows with batch-max padding),
`batch_norm_apply` takes an optional `extra_count` — a number of all-zero
phantom rows added to the statistics' denominator.  Passing
`B * max(mol_size) - real_nodes` reproduces the reference's per-batch-max
padding semantics exactly (padding rows are zero, so they only change the
count).  Enabled via `ModelConfig.bn_count_padding`.

Semantics match torch BatchNorm1d otherwise: biased variance for
normalization, unbiased variance into the running estimate, momentum 0.1,
eps 1e-5 (torch defaults, used at `layers.py:399`).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

BNParams = Dict[str, jnp.ndarray]
BNState = Dict[str, jnp.ndarray]

EPS = 1e-5
MOMENTUM = 0.1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _bn_train_core(x, mask, extra, scale, bias, axis_name):
    """Masked train-mode BN with a hand-written backward.

    XLA's autodiff of the naive formulation materializes the statistic
    cotangents inside large transpose fusions that run far below HBM
    bandwidth (profiled 6-8 ms per [225k, 1400] reduction on v5e).  The
    custom backward needs exactly TWO wide reductions (sum g, sum g*x)
    and ONE elementwise pass — the roofline minimum for BN backward.
    `extra` is a scalar count of phantom zero rows (see module docstring).
    Returns (y, mean, biased-clamped var, count)."""
    out, _ = _bn_core_fwd(x, mask, extra, scale, bias, axis_name)
    return out


def _bn_train_fwd_math(x, mask, extra, axis_name):
    m = mask[:, None]
    count = jnp.sum(mask) + extra
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32 * m, axis=0)
    s2 = jnp.sum(x32 * x32 * m, axis=0)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
    count = jnp.maximum(count, 1.0)
    mean = s1 / count
    raw = s2 / count - mean * mean
    var = jnp.maximum(raw, 0.0)
    gate = (raw > 0.0).astype(jnp.float32)   # maximum(., 0) subgradient
    return None, mean, var, count, gate, x32


def _bn_core_fwd(x, mask, extra, scale, bias, axis_name):
    _, mean, var, count, gate, _ = _bn_train_fwd_math(x, mask, extra,
                                                      axis_name)
    inv = jax.lax.rsqrt(var + EPS)
    y = (x.astype(jnp.float32) - mean) * inv * scale + bias
    return (y, mean, var, count), (x, mask, scale, mean, inv, count, gate)


def _bn_core_bwd(axis_name, res, cts):
    g, g_mean, g_var, _ = cts
    x, mask, scale, mean, inv, count, gate = res
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    G = jnp.sum(g32, axis=0)                       # [F]
    Sgx = jnp.sum(g32 * x32, axis=0)               # [F]
    # param grads stay LOCAL (the surrounding data-parallel grad psum
    # sums them); the statistic cotangents feeding dx must be GLOBAL
    d_scale = inv * (Sgx - mean * G)
    d_bias = G
    if axis_name is not None:
        G = jax.lax.psum(G, axis_name)
        Sgx = jax.lax.psum(Sgx, axis_name)
    centered = Sgx - mean * G
    # dL/dvar: from y (gated through the clamp) plus the direct var output
    dv = gate * (-0.5 * inv ** 3 * scale * centered + g_var)
    # dL/dmean: direct y term plus the mean output; var's dependence on
    # mean is folded below via s1 (var = s2/c - (s1/c)^2)
    dm = -inv * scale * G + g_mean
    c = count
    ds1 = (dm - 2.0 * mean * dv) / c
    ds2 = dv / c
    dx = (g32 * (inv * scale)
          + mask[:, None] * (ds1 + 2.0 * ds2 * x32)).astype(x.dtype)
    return dx, jnp.zeros_like(mask), jnp.zeros(()), d_scale, d_bias


_bn_train_core.defvjp(_bn_core_fwd, _bn_core_bwd)


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
    extra_count=None,        # scalar: phantom zero rows in the statistics
) -> Tuple[jnp.ndarray, BNState]:
    """Masked BN over the leading axis.  When `axis_name` is given, moments
    are psum'd over that mesh axis so sharded training normalizes with
    GLOBAL batch statistics (the reference is single-device; this is the
    multi-chip generalization)."""
    if train:
        extra = (jnp.zeros((), jnp.float32) if extra_count is None
                 else jnp.asarray(extra_count, jnp.float32))
        y, mean, var, count = _bn_train_core(
            x, mask, extra, params["scale"], params["bias"], axis_name
        )
        unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
        new_state = {
            "mean": (1 - MOMENTUM) * state["mean"] + MOMENTUM * mean,
            "var": (1 - MOMENTUM) * state["var"] + MOMENTUM * unbiased,
        }
        return y, new_state
    mean, var = state["mean"], state["var"]
    inv = jax.lax.rsqrt(var + EPS)
    y = (x - mean) * inv * params["scale"] + params["bias"]
    return y, state
