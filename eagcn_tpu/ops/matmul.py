"""bf16-through-the-backward matmuls (custom VJP).

A plain ``jnp.einsum(x.astype(bf16), w.astype(bf16),
preferred_element_type=f32)`` runs its FORWARD on the MXU at bf16 rate,
but autodiff transposes it with the f32 cotangent of the f32 output — so
both backward dots run at fp32 rate (~4x slower on v5e) and read 2x the
bytes.  Profiling round 3 measured the backward projection matmuls at
~3x their forward cost for exactly this reason.

These wrappers pin the whole train step to bf16 MXU rate: inputs are cast
to bf16, accumulation is fp32 (`preferred_element_type`), and the custom
VJP casts the incoming cotangent to bf16 before the two transpose dots.
Weight gradients are returned in the weight's own dtype (f32 for params,
so the optimizer accumulates exactly)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

BF16 = jnp.bfloat16


@jax.custom_vjp
def dot_bf16(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[N, K] @ [K, M] -> [N, M] f32, bf16 MXU rate fwd AND bwd."""
    return jnp.dot(x.astype(BF16), w.astype(BF16),
                   preferred_element_type=jnp.float32)


def _dot_fwd(x, w):
    return dot_bf16(x, w), (x, w)


def _dot_bwd(res, g):
    x, w = res
    g16 = g.astype(BF16)
    dx = jnp.dot(g16, w.astype(BF16).T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.dot(x.astype(BF16).T, g16,
                 preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


dot_bf16.defvjp(_dot_fwd, _dot_bwd)


@jax.custom_vjp
def bmm_bf16(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched [T, S, S] @ [T, S, F] -> [T, S, F] f32 accum, bf16 rate."""
    return jnp.einsum("tij,tjf->tif", a.astype(BF16), x.astype(BF16),
                      preferred_element_type=jnp.float32)


def _bmm_fwd(a, x):
    return bmm_bf16(a, x), (a, x)


def _bmm_bwd(res, g):
    a, x = res
    g16 = g.astype(BF16)
    da = jnp.einsum("tif,tjf->tij", g16, x.astype(BF16),
                    preferred_element_type=jnp.float32).astype(a.dtype)
    dx = jnp.einsum("tij,tif->tjf", a.astype(BF16), g16,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    return da, dx


bmm_bf16.defvjp(_bmm_fwd, _bmm_bwd)
