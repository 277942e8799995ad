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
so the optimizer accumulates exactly).

`out_dtype` (static) lets the hot path request a bf16 RESULT: the MXU
still accumulates fp32 internally, but the [N, F] output buffer is
written at half width — profiling showed the f32 write + separate
downcast of the projection outputs costing ~2 GB/step of HBM traffic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BF16 = jnp.bfloat16


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dot_bf16(x: jnp.ndarray, w: jnp.ndarray,
             out_dtype: str = "float32") -> jnp.ndarray:
    """[N, K] @ [K, M] -> [N, M] (fp32 accum), bf16 MXU rate fwd AND bwd."""
    return jnp.dot(x.astype(BF16), w.astype(BF16),
                   preferred_element_type=jnp.float32).astype(out_dtype)


def _dot_fwd(x, w, out_dtype):
    return dot_bf16(x, w, out_dtype), (x, w)


def _dot_bwd(out_dtype, res, g):
    x, w = res
    g16 = g.astype(BF16)
    dx = jnp.dot(g16, w.astype(BF16).T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jnp.dot(x.astype(BF16).T, g16,
                 preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


dot_bf16.defvjp(_dot_fwd, _dot_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def bmm_bf16(a: jnp.ndarray, x: jnp.ndarray,
             out_dtype: str = "float32") -> jnp.ndarray:
    """Batched [T, S, S] @ [T, S, F] -> [T, S, F] fp32 accum, bf16 rate."""
    return jnp.einsum("tij,tjf->tif", a.astype(BF16), x.astype(BF16),
                      preferred_element_type=jnp.float32).astype(out_dtype)


def _bmm_fwd(a, x, out_dtype):
    return bmm_bf16(a, x, out_dtype), (a, x)


def _bmm_bwd(out_dtype, res, g):
    a, x = res
    g16 = g.astype(BF16)
    da = jnp.einsum("tif,tjf->tij", g16, x.astype(BF16),
                    preferred_element_type=jnp.float32).astype(a.dtype)
    dx = jnp.einsum("tij,tif->tjf", a.astype(BF16), g16,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    return da, dx


bmm_bf16.defvjp(_bmm_fwd, _bmm_bwd)
