"""Denoising score-matching loss for SDE training (functional, jit-safe).

TPU-native redesign of `/root/reference/src/fdiff/utils/losses.py:12-127`.
The torch closure factory becomes a pure function of (apply_fn, params, batch,
key); the diagonal `diag_embed` matmuls collapse to elementwise broadcasts.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from fdtpu.diffusion.sde import SDE

Array = jax.Array


def sde_loss(
    apply_fn: Callable[..., Array],
    params: Any,
    scheduler: SDE,
    x: Array,
    key: Array,
    timesteps: Optional[Array] = None,
    reduce_mean: bool = True,
    likelihood_weighting: bool = False,
    train: bool = True,
    sample_weight: Optional[Array] = None,
) -> Array:
    """Scalar DSM loss over a mini-batch.

    Args:
        apply_fn: ``apply_fn(params, x_noisy, t, train=..., rngs=...) -> score``.
        params: model parameters (passed through to ``apply_fn``).
        scheduler: VP/VE scheduler pytree.
        x: clean batch ``(B, max_len, n_channels)`` (already in the model domain).
        key: PRNG key; split internally for t, z, and dropout.
        timesteps: optional fixed timesteps ``(B,)`` (reference losses.py:59-63
          samples t ~ U[eps, T] when absent).
        reduce_mean: mean vs 0.5·sum over data dims (reference losses.py:33-37).
        likelihood_weighting: Mahalanobis weighting (reference losses.py:111-122).
        train: enables dropout inside the model.
        sample_weight: optional ``(B,)`` per-sample weights; the loss becomes
          ``sum(w·l)/sum(w)``.  With 0/1 weights this reproduces the exact
          partial-batch mean gradient (torch DataLoader drop_last=False) on
          a batch padded to a static shape.

    Parity: reference ``get_sde_loss_fn`` (losses.py:39-125) with
    λ(t) = 1/tr(Σ⁻¹) default weighting.
    """
    key_t, key_z, key_drop = jax.random.split(key, 3)
    batch_size = x.shape[0]

    if timesteps is None:
        timesteps = (
            jax.random.uniform(key_t, (batch_size,), dtype=x.dtype)
            * (scheduler.T - scheduler.eps)
            + scheduler.eps
        )

    z = jax.random.normal(key_z, x.shape, dtype=x.dtype)

    _, std = scheduler.marginal_prob(x, timesteps)  # (B, max_len)
    var = std**2

    noise = std[..., None] * z  # diag(std) @ z
    target_noise = z / std[..., None]  # diag(1/std) @ z

    x_noisy = scheduler.add_noise(x, noise, timesteps)

    score = apply_fn(
        params, x_noisy, timesteps, train=train, rngs={"dropout": key_drop}
    )

    if not likelihood_weighting:
        weighting = 1.0 / jnp.sum(1.0 / var, axis=1)  # (B,)
        losses = weighting[:, None, None] * jnp.square(score + target_noise)
    else:
        difference = score + target_noise
        losses = jnp.square(std[..., None] * difference)

    losses = losses.reshape(batch_size, -1)
    if reduce_mean:
        losses = jnp.mean(losses, axis=-1)
    else:
        losses = 0.5 * jnp.sum(losses, axis=-1)
    if sample_weight is not None:
        w = sample_weight.astype(losses.dtype)
        return jnp.sum(w * losses) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(losses)
