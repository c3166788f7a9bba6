"""Jitted train / eval steps.

One compiled function owns the whole per-step computation (forward, loss,
backward, clip, AdamW update, schedule step — and for eval, the streaming
Pearson merge), mirroring the reference hot loop (litmodule.py:259-342 +
Lightning internals) as a single XLA program.

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

__all__ = ["TrainState", "ForwardFn", "make_train_step", "make_eval_step"]

# forward(params, batch, rng, train) -> (pred (B, P) f32, l2_reg scalar)
ForwardFn = Callable[[Any, Mapping[str, jnp.ndarray], jax.Array, bool], tuple]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def _masked_mse(pred: jnp.ndarray, y: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
    m = row_mask.astype(pred.dtype)[:, None]
    n_valid = jnp.maximum(jnp.sum(row_mask), 1.0)
    return jnp.sum(jnp.square(pred - y.astype(pred.dtype)) * m) / (
        n_valid * y.shape[1]
    )


def make_train_step(
    forward_fn: ForwardFn,
    tx: optax.GradientTransformation,
    donate: bool = True,
):
    def loss_fn(params, batch, rng):
        pred, l2_reg = forward_fn(params, batch, rng, True)
        mse = _masked_mse(pred, batch["timeseries"], batch["row_mask"])
        loss = mse + l2_reg
        return loss, {"brain_loss": loss, "mse": mse, "l2_reg": l2_reg}

    def train_step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
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
