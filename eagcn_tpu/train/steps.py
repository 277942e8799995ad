"""Jitted train / eval step builders.

The reference's train loop re-dispatches per-op per-step from Python
(`eagcn_pytorch/train.py:310-334`); here the whole step — forward, loss,
backward, Adam update, BN state update — is ONE compiled XLA program with
donated buffers (no host round-trip, no reallocation)."""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import apply_eagcn
from ..utils.config import ModelConfig
from .losses import mse_loss, weighted_bce_loss


def make_optimizer(learning_rate: float, weight_decay: float):
    """torch.optim.Adam(lr, weight_decay) parity (`train.py:303`): the
    decay term is added to the GRADIENT before the Adam moments (classic
    L2, not AdamW), eps=1e-8, betas=(0.9, 0.999)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-learning_rate),
    )


def make_train_step(
    cfg: ModelConfig,
    task_type: str,
    tx: optax.GradientTransformation,
    class_weights=None,
    axis_name: Optional[str] = None,
    split: bool = True,
    fold_step: bool = False,
) -> Callable:
    """Builds the train step.

    `split=True` (default for the single-device path) compiles the step as
    TWO programs — value_and_grad, then optimizer-update — instead of one:
    this environment's remote TPU compiler handles each in a couple of
    minutes but effectively hangs on the fused-and-donated single program.
    The extra dispatch is hidden by async dispatch pipelining.  shard_map
    callers always receive the fused single-function form.

    `fold_step=True` changes the signature to
        (params, state, opt_state, batch, rng, step_id) -> ...
    with the per-step dropout key derived as fold_in(rng, step_id) INSIDE
    the compiled program.  Calling `jax.random.fold_in` on the host each
    step forces a host↔device round-trip that breaks async dispatch
    pipelining over the remote-TPU tunnel (measured: 34 ms/step with host
    fold_in vs 10 ms/step with the fold inside jit — scripts/
    probe_dispatch.py)."""
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def loss_fn(params, state, batch, rng):
        logits, _, _, new_state = apply_eagcn(
            params, state, batch, cfg, train=True, rng=rng,
            axis_name=axis_name,
        )
        if task_type == "reg":
            loss = mse_loss(logits, batch.labels, batch.mol_mask)
        else:
            loss = weighted_bce_loss(logits, batch.labels, batch.mol_mask, cw)
        return loss, new_state

    def step(params, state, opt_state, batch, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, batch, rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    if axis_name is not None:
        return step  # caller wraps in shard_map and jits

    if not split:
        if not fold_step:
            return jax.jit(step, donate_argnums=(0, 1, 2))

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def fused_folded(params, state, opt_state, batch, rng, step_id):
            return step(params, state, opt_state, batch,
                        jax.random.fold_in(rng, step_id))

        return fused_folded

    if fold_step:
        @partial(jax.jit, donate_argnums=(1,))
        def grad_fn(params, state, batch, rng, step_id):
            rng = jax.random.fold_in(rng, step_id)
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, state, batch, rng)
    else:
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True),
                          donate_argnums=(1,))

    @partial(jax.jit, donate_argnums=(0, 1))
    def update_fn(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state

    if fold_step:
        def split_step(params, state, opt_state, batch, rng, step_id):
            (loss, new_state), grads = grad_fn(
                params, state, batch, rng, step_id)
            params, opt_state = update_fn(params, opt_state, grads)
            return params, new_state, opt_state, loss
    else:
        def split_step(params, state, opt_state, batch, rng):
            (loss, new_state), grads = grad_fn(params, state, batch, rng)
            params, opt_state = update_fn(params, opt_state, grads)
            return params, new_state, opt_state, loss

    return split_step


def make_scan_step(
    cfg: ModelConfig,
    task_type: str,
    tx: optax.GradientTransformation,
    class_weights=None,
) -> Callable:
    """One dispatch per CHUNK of train steps via `lax.scan`.

    Per-step host dispatch over this environment's remote-TPU tunnel
    measures ~20-40 ms — an order of magnitude more than the ~2 ms
    molecule-batch step compute (HIV: 45 s/epoch, of which <3 s is
    device time).  Scanning K same-shape steps in one compiled program
    amortizes the dispatch K-fold.  Signature:
        (params, state, opt_state, stacked_batch [K,...], step_ids [K],
         drop_key) -> (params, state, opt_state, losses [K])
    Per-step dropout keys are fold_in(drop_key, global_step_id), the same
    schedule as the non-scan path."""
    cw = None if class_weights is None else jnp.asarray(class_weights)

    def loss_fn(params, state, batch, rng):
        logits, _, _, new_state = apply_eagcn(
            params, state, batch, cfg, train=True, rng=rng,
        )
        if task_type == "reg":
            loss = mse_loss(logits, batch.labels, batch.mol_mask)
        else:
            loss = weighted_bce_loss(logits, batch.labels, batch.mol_mask, cw)
        return loss, new_state

    def body(carry, xs):
        params, state, opt_state, drop_key = carry
        batch, idx = xs
        rng = jax.random.fold_in(drop_key, idx)
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_state, opt_state, drop_key), loss

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def scan_step(params, state, opt_state, stacked, step_ids, drop_key):
        (params, state, opt_state, _), losses = jax.lax.scan(
            body, (params, state, opt_state, drop_key), (stacked, step_ids)
        )
        return params, state, opt_state, losses

    return scan_step


def make_eval_step(cfg: ModelConfig, task_type: str) -> Callable:
    """Returns predictions in metric space: sigmoid probabilities for
    classification (`train.py:146` F.sigmoid), raw outputs for
    regression."""

    @jax.jit
    def step(params, state, batch):
        logits, atom_reps, graph_rep, _ = apply_eagcn(
            params, state, batch, cfg, train=False
        )
        preds = jax.nn.sigmoid(logits) if task_type == "class" else logits
        return preds, atom_reps, graph_rep

    return step
