"""Jitted train / eval steps.

One compiled function owns the whole per-step computation (forward, loss,
backward, clip, AdamW update, schedule step — and for eval, the streaming
Pearson merge), mirroring the reference hot loop (litmodule.py:259-342 +
Lightning internals) as a single XLA program.

Frozen parameters are **AD constants**: the param tree is partitioned by the
trainable-label tree and only the trainable subtree is differentiated (the
reference gets this from ``requires_grad=False``/peft).  This matters beyond
speed — under ``lax.scan`` over layers, a cotangent for the stacked frozen
params would materialize a full fp32 zero tree (~14 GB at 7B), which
``stop_gradient`` alone does not prevent.

The loss is the reference's ``F.mse_loss(pred, y) + l2_reg``
(litmodule.py:302) made row-mask aware: padded rows of the fixed-shape batch
contribute nothing, so a partial final batch produces exactly the mean the
reference computes over its smaller batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax

from phantom_vlb_tpu.train.metrics import PearsonState, pearson_update

__all__ = [
    "TrainState",
    "ForwardFn",
    "init_train_state",
    "make_train_step",
    "make_eval_step",
    "partition_params",
    "combine_params",
]

# forward(params, batch, rng, train) -> (pred (B, P) f32, l2_reg scalar)
ForwardFn = Callable[[Any, Mapping[str, jnp.ndarray], jax.Array, bool], tuple]

_IS_NONE = lambda x: x is None  # noqa: E731


def partition_params(params, labels):
    """Split into (trainable, frozen) trees; non-selected leaves become None
    (None is an empty pytree node, so AD and optax simply never see them)."""
    trainable = jax.tree.map(
        lambda lbl, p: p if lbl == "train" else None, labels, params
    )
    frozen = jax.tree.map(
        lambda lbl, p: None if lbl == "train" else p, labels, params
    )
    return trainable, frozen


def combine_params(trainable, frozen):
    return jax.tree.map(
        lambda t, f: f if t is None else t, trainable, frozen, is_leaf=_IS_NONE
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_train_state(params, tx: optax.GradientTransformation, labels=None):
    """Build (TrainState, frozen).

    With ``labels``, ``state.params`` holds ONLY the trainable subtree and the
    frozen subtree is returned separately: it is passed to the train step as a
    read-only argument, so the multi-GB frozen backbone is never donated or
    double-buffered across steps.  Without labels, frozen is None and
    ``state.params`` is the full tree.
    """
    if labels is None:
        trainable, frozen = params, None
    else:
        trainable, frozen = partition_params(params, labels)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=trainable,
        opt_state=tx.init(trainable),
    )
    return state, frozen


def _masked_mse(pred: jnp.ndarray, y: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    m = row_mask.astype(pred.dtype)[:, None]
    n_valid = jnp.maximum(jnp.sum(row_mask), 1.0)
    return jnp.sum(jnp.square(pred - y.astype(pred.dtype)) * m) / (
        n_valid * y.shape[1]
    )


def make_train_step(
    forward_fn: ForwardFn,
    tx: optax.GradientTransformation,
    labels=None,
    donate: bool = True,
):
    """Returns ``step(state, frozen, batch, rng) -> (state, metrics)``.

    ``state`` (trainable params + opt state) is donated; ``frozen`` is a
    read-only argument — one resident copy of the backbone, ever.
    """
    has_frozen = labels is not None

    def loss_fn(trainable, frozen, batch, rng):
        params = combine_params(trainable, frozen) if has_frozen else trainable
        pred, l2_reg = forward_fn(params, batch, rng, True)
        mse = _masked_mse(pred, batch["timeseries"], batch["row_mask"])
        loss = mse + l2_reg
        return loss, {"brain_loss": loss, "mse": mse, "l2_reg": l2_reg}

    def train_step(state: TrainState, frozen, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # Non-finite losses never touch the state (so 'last'/'best'
        # checkpoints cannot be NaN-poisoned, ADVICE.md round 1); the loop
        # still aborts after a streak of them (train/loop.py).
        finite = jnp.isfinite(metrics["brain_loss"])
        keep = lambda new, old: jax.tree.map(  # noqa: E731
            lambda n, o: jnp.where(finite, n, o), new, old
        )
        new_state = TrainState(
            step=state.step + finite.astype(state.step.dtype),
            params=keep(new_params, state.params),
            opt_state=keep(new_opt_state, state.opt_state),
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(forward_fn: ForwardFn):
    def eval_step(params, batch, pearson: PearsonState, rng):
        pred, l2_reg = forward_fn(params, batch, rng, False)
        mse = _masked_mse(pred, batch["timeseries"], batch["row_mask"])
        loss = mse + l2_reg
        new_pearson = pearson_update(
            pearson, pred, batch["timeseries"], batch["row_mask"]
        )
        n = jnp.sum(batch["row_mask"])
        return new_pearson, {"brain_loss": loss, "n": n}

    return jax.jit(eval_step)
