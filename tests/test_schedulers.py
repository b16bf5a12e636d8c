"""Scheduler tests (mirrors reference tests/test_schedulers.py and adds
closed-form cross-checks against the torch implementation's math)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.diffusion import VEScheduler, VPScheduler, noise_scaling_matrix
from fdtpu.diffusion.sde import noise_scaling_vector

MAX_LEN, CHANNELS, BATCH = 20, 3, 8


@pytest.mark.parametrize("max_len", [20, 21])
def test_noise_scaling_vector(max_len):
    g = noise_scaling_vector(max_len, True)
    assert float(g[0]) == 1.0
    if max_len % 2 == 0:
        assert float(g[max_len // 2]) == 1.0
    others = [i for i in range(max_len) if i != 0 and not (max_len % 2 == 0 and i == max_len // 2)]
    np.testing.assert_allclose(np.asarray(g)[others], 1 / math.sqrt(2), atol=1e-6)
    g_plain = noise_scaling_vector(max_len, False)
    np.testing.assert_allclose(g_plain, 1.0)
    assert noise_scaling_matrix(max_len, True).shape == (max_len, max_len)


@pytest.mark.parametrize("scheduler_cls", [VPScheduler, VEScheduler])
@pytest.mark.parametrize("fns", [True, False])
def test_marginal_prob_shapes_and_values(scheduler_cls, fns):
    sde = scheduler_cls(fourier_noise_scaling=fns).with_noise_scaling(MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, MAX_LEN, CHANNELS))
    t = jnp.full((BATCH,), 0.5)
    mean, std = sde.marginal_prob(x, t)
    assert mean.shape == x.shape
    assert std.shape == (BATCH, MAX_LEN)

    if scheduler_cls is VPScheduler:
        lmc = -0.25 * 0.5**2 * (20.0 - 0.1) - 0.5 * 0.5 * 0.1
        np.testing.assert_allclose(mean, math.exp(lmc) * x, rtol=1e-5)
        base = math.sqrt(1 - math.exp(2 * lmc))
    else:
        np.testing.assert_allclose(mean, x, rtol=1e-6)
        base = 0.01 * (50.0 / 0.01) ** 0.5
    g = noise_scaling_vector(MAX_LEN, fns)
    expected = np.broadcast_to(base * np.asarray(g)[None, :], (BATCH, MAX_LEN))
    np.testing.assert_allclose(std, expected, rtol=1e-4)


@pytest.mark.parametrize("scheduler_cls", [VPScheduler, VEScheduler])
def test_add_noise_and_step_shapes(scheduler_cls):
    sde = scheduler_cls(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (BATCH, MAX_LEN, CHANNELS))
    t = jnp.full((BATCH,), 0.7)
    _, std = sde.marginal_prob(x, t)
    z = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    noisy = sde.add_noise(x, std[..., None] * z, t)
    assert noisy.shape == x.shape

    ts, step_size = sde.timesteps(10)
    assert ts.shape == (10,)
    assert float(step_size) > 0
    out = sde.step(jnp.zeros_like(x), ts[0], x, z, step_size)
    assert out.shape == x.shape


@pytest.mark.parametrize("scheduler_cls", [VPScheduler, VEScheduler])
def test_prior_sampling_statistics(scheduler_cls):
    sde = scheduler_cls(fourier_noise_scaling=True).with_noise_scaling(64)
    x = sde.prior_sampling(jax.random.PRNGKey(3), (4000, 64, 1))
    std = np.asarray(x).std(axis=0)[:, 0]
    g = np.asarray(noise_scaling_vector(64, True))
    scale = 50.0 if scheduler_cls is VEScheduler else 1.0
    np.testing.assert_allclose(std, scale * g, rtol=0.1)


def test_vp_step_matches_manual_euler_maruyama():
    """One reverse Euler–Maruyama step, cross-checked against the closed form
    of reference sde.py:215-246."""
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, MAX_LEN, CHANNELS))
    score = jax.random.normal(jax.random.PRNGKey(5), x.shape)
    z = jax.random.normal(jax.random.PRNGKey(6), x.shape)
    t = jnp.asarray(0.9)
    dt = jnp.asarray(0.01)

    beta = 0.1 + 0.9 * (20.0 - 0.1)
    g = np.asarray(noise_scaling_vector(MAX_LEN, True))
    diffusion = np.sqrt(beta) * g
    drift = -0.5 * beta * np.asarray(x) - (diffusion**2)[None, :, None] * np.asarray(score)
    expected = (
        np.asarray(x)
        - drift * 0.01
        + math.sqrt(0.01) * diffusion[None, :, None] * np.asarray(z)
    )
    np.testing.assert_allclose(sde.step(score, t, x, z, dt), expected, rtol=1e-4)


def test_scheduler_is_pytree():
    """Schedulers must flow through jit without becoming static."""
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(8)

    @jax.jit
    def f(s, x, t):
        return s.marginal_prob(x, t)[1]

    x = jnp.ones((2, 8, 1))
    out = f(sde, x, jnp.full((2,), 0.5))
    assert out.shape == (2, 8)
