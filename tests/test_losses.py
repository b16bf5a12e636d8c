"""DSM loss variant tests (likelihood weighting, reduce op, fixed timesteps)."""

import jax
import jax.numpy as jnp
import numpy as np

from fdtpu.diffusion import VPScheduler
from fdtpu.diffusion.losses import sde_loss

MAX_LEN, CHANNELS, BATCH = 12, 2, 8


def const_apply(score_value):
    def apply_fn(params, xn, t, train, rngs):
        return jnp.full_like(xn, score_value)
    return apply_fn


def test_default_weighting_closed_form():
    """With score ≡ 0, loss = mean_b[ w_b · mean(z²/std²) ] where
    w_b = 1/Σ(1/var) — verifiable directly."""
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, MAX_LEN, CHANNELS))
    t = jnp.full((BATCH,), 0.5)
    key = jax.random.PRNGKey(1)

    loss = sde_loss(const_apply(0.0), None, sde, x, key, timesteps=t, train=False)

    # Recompute by hand with the same internal PRNG usage.
    _, key_z, _ = jax.random.split(key, 3)
    z = jax.random.normal(key_z, x.shape)
    _, std = sde.marginal_prob(x, t)
    var = std**2
    w = 1.0 / jnp.sum(1.0 / var, axis=1)
    per = w[:, None, None] * (z / std[..., None]) ** 2
    expected = float(jnp.mean(jnp.mean(per.reshape(BATCH, -1), axis=-1)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_likelihood_weighting_closed_form():
    """Mahalanobis form: ||std·(s + z/std)||² = ||std·s + z||²."""
    sde = VPScheduler().with_noise_scaling(MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, MAX_LEN, CHANNELS))
    t = jnp.full((BATCH,), 0.7)
    key = jax.random.PRNGKey(3)
    s_val = 0.3

    loss = sde_loss(
        const_apply(s_val), None, sde, x, key, timesteps=t,
        likelihood_weighting=True, train=False,
    )

    _, key_z, _ = jax.random.split(key, 3)
    z = jax.random.normal(key_z, x.shape)
    _, std = sde.marginal_prob(x, t)
    per = (std[..., None] * s_val + z) ** 2
    expected = float(jnp.mean(jnp.mean(per.reshape(BATCH, -1), axis=-1)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_reduce_sum_variant():
    sde = VPScheduler().with_noise_scaling(MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(4), (BATCH, MAX_LEN, CHANNELS))
    t = jnp.full((BATCH,), 0.5)
    key = jax.random.PRNGKey(5)
    mean_loss = sde_loss(const_apply(0.0), None, sde, x, key, timesteps=t, train=False)
    sum_loss = sde_loss(
        const_apply(0.0), None, sde, x, key, timesteps=t, reduce_mean=False, train=False
    )
    # 0.5 * sum over D dims vs mean over D dims: ratio = 0.5 * D.
    d = MAX_LEN * CHANNELS
    np.testing.assert_allclose(float(sum_loss), float(mean_loss) * 0.5 * d, rtol=1e-5)


def test_random_timesteps_in_range():
    sde = VPScheduler().with_noise_scaling(MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(6), (BATCH, MAX_LEN, CHANNELS))
    loss = sde_loss(const_apply(0.0), None, sde, x, jax.random.PRNGKey(7), train=False)
    assert np.isfinite(float(loss))


def test_sample_weight_reproduces_partial_batch_mean():
    """0/1 weights on a padded batch == exact loss of the unpadded batch.

    The deterministic const_apply score makes the loss independent of the
    padded rows' contents only through the weights, so equality is exact up
    to the per-sample t/z draws — pin timesteps and compare against a
    hand-weighted mean.
    """
    sde = VPScheduler().with_noise_scaling(MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(8), (BATCH, MAX_LEN, CHANNELS))
    t = jnp.full((BATCH,), 0.4)
    key = jax.random.PRNGKey(9)
    w = jnp.array([1.0] * (BATCH - 2) + [0.0, 0.0])
    weighted = sde_loss(
        const_apply(0.0), None, sde, x, key, timesteps=t, train=False,
        sample_weight=w,
    )
    # Recompute the same per-sample losses and weight them by hand
    # (score ≡ 0 → per-sample loss = λ_b · mean(z²/std²), λ_b = 1/Σ 1/var).
    _, key_z, _ = jax.random.split(key, 3)
    z = jax.random.normal(key_z, x.shape, dtype=x.dtype)
    _, std = sde.marginal_prob(x, t)
    lam = 1.0 / jnp.sum(1.0 / std**2, axis=1)
    per = lam[:, None, None] * (z / std[..., None]) ** 2
    per_sample = jnp.mean(per.reshape(BATCH, -1), axis=-1)
    expected = float(jnp.sum(w * per_sample) / jnp.sum(w))
    np.testing.assert_allclose(float(weighted), expected, rtol=1e-5)
