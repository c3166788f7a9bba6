"""Optimizer / schedule factory.

Reference recipe (litmodule.py:345-379 + experiment yamls): AdamW over
``requires_grad`` params only, lr 1e-4, betas (0.9, 0.999), eps 1e-8, weight
decay 1e-2, ``CosineAnnealingLR(T_max=50000)`` stepped **per step**, global
gradient clip 1.0 (trainer ``gradient_clip_val: 1``).

TPU mapping: one ``optax.chain`` of global-norm clip + AdamW on a cosine
decay schedule; frozen parameters are routed to ``optax.set_to_zero`` via
``optax.multi_transform`` so optimizer state exists only for trainable leaves
(the LoRA memory property the reference gets from param filtering).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax

__all__ = ["OptimConfig", "make_optimizer", "trainable_labels"]

import dataclasses


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 1e-2
    lr_scheduler_name: str = "CosineAnnealingLR"
    t_max: int = 50_000
    grad_clip: float = 1.0


def make_schedule(config: OptimConfig) -> optax.Schedule:
    if config.lr_scheduler_name == "CosineAnnealingLR":
        # torch closed form: eta_t = lr * (1 + cos(pi * t / T_max)) / 2
        # (eta_min = 0).  Deliberately NOT optax.cosine_decay_schedule, which
        # clamps at 0 past T_max — torch's schedule is periodic and raises the
        # LR again beyond T_max (litmodule.py:365-371 steps it per-step with
        # no horizon guard), so runs longer than t_max steps must match.
        import jax.numpy as jnp

        def schedule(step):
            t = jnp.asarray(step, jnp.float32)
            return config.lr * (1.0 + jnp.cos(jnp.pi * t / config.t_max)) / 2.0

        return schedule
    if config.lr_scheduler_name in ("constant", "ConstantLR"):
        return optax.constant_schedule(config.lr)
    raise ValueError(f"unknown scheduler {config.lr_scheduler_name!r}")


def trainable_labels(params, predicate: Callable[[tuple, object], bool]):
    """Label tree: 'train' where predicate(path, leaf) else 'freeze'."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: "train" if predicate(path, leaf) else "freeze", params
    )


def make_optimizer(config: OptimConfig) -> optax.GradientTransformation:
    """AdamW + cosine + clip. Freezing is handled upstream: the train step
    differentiates and optimizes only the trainable subtree
    (train/step.py::partition_params), so no optax masking is needed."""
    schedule = make_schedule(config)
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=config.betas[0],
            b2=config.betas[1],
            eps=config.eps,
            weight_decay=config.weight_decay,
        ),
    )
