"""Loss functions with padding-molecule masking.

Reference semantics (`eagcn_pytorch/train.py:321-331`):
  * regression: plain MSE over all (mol, task) elements
  * classification: per-element weighted BCE-with-logits where the weight is
    w_pos[task] for label 1, w_neg[task] for label 0, and 0 for the missing
    label marker -1 (`utils.py:653-700`), sum-reduced then divided by the
    number of OBSERVED labels.
Padding molecules of the packed mega-graph get weight 0 everywhere and are
excluded from the observed count."""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             mol_mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over real molecules (torch MSELoss mean
    reduction, `train.py:322-325`)."""
    m = mol_mask[:, None]
    sq = (logits - labels) ** 2 * m
    count = jnp.maximum(jnp.sum(m * jnp.ones_like(labels)), 1.0)
    return jnp.sum(sq) / count


def weighted_bce_loss(
    logits: jnp.ndarray,       # [B, T]
    labels: jnp.ndarray,       # [B, T] in {1, 0, -1}
    mol_mask: jnp.ndarray,     # [B]
    class_weights: jnp.ndarray,  # [T, 2] = [w_pos, w_neg]
) -> jnp.ndarray:
    m = mol_mask[:, None]
    is_pos = (labels == 1.0).astype(jnp.float32) * m
    is_neg = (labels == 0.0).astype(jnp.float32) * m
    w = is_pos * class_weights[None, :, 0] + is_neg * class_weights[None, :, 1]
    # numerically-stable BCE with logits on clamped targets
    y = jnp.clip(labels, 0.0, 1.0)
    per_elem = jnp.maximum(logits, 0.0) - logits * y + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    observed = jnp.maximum(jnp.sum(is_pos + is_neg), 1.0)
    return jnp.sum(w * per_elem) / observed
