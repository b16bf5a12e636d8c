"""Train state + optimizer (optax AdamW, warmup-cosine, grad clipping).

Replaces the reference's Lightning `configure_optimizers`
(`/root/reference/src/fdiff/models/score_models.py:316-324`): AdamW at
``lr_max`` with diffusers' cosine-with-warmup schedule (warmup =
num_training_steps // 10, score_models.py:44) and global-norm clipping 1.0
(conf/trainer/default.yaml:4), stepped per-batch.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

Array = jax.Array


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: Array


def make_lr_schedule(
    lr_max: float,
    num_training_steps: int,
    num_warmup_steps: int | None = None,
) -> optax.Schedule:
    """Linear warmup + cosine decay to 0 (diffusers
    ``get_cosine_schedule_with_warmup`` semantics, reference
    score_models.py:316-324; warmup = num_training_steps // 10)."""
    if num_warmup_steps is None:
        num_warmup_steps = num_training_steps // 10
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr_max,
        warmup_steps=max(1, num_warmup_steps),
        decay_steps=max(2, num_training_steps),
        end_value=0.0,
    )


def make_optimizer(
    lr_max: float,
    num_training_steps: int,
    num_warmup_steps: int | None = None,
    gradient_clip_val: float = 1.0,
    weight_decay: float = 0.01,
    accumulate_grad_batches: int = 1,
) -> optax.GradientTransformation:
    """AdamW + warmup-cosine + global-norm clipping, optionally wrapped in
    `optax.MultiSteps` for gradient accumulation (reference Lightning's
    ``accumulate_grad_batches``, extraction.py:12-17: the schedule advances
    once per accumulated step, matching the num_training_steps division in
    :func:`fdtpu.train.trainer.get_training_params`)."""
    schedule = make_lr_schedule(lr_max, num_training_steps, num_warmup_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(gradient_clip_val),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
