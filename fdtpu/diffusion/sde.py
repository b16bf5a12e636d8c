"""VP / VE SDE schedulers as functional pytree dataclasses.

TPU-native redesign of the reference scheduler layer
(`/root/reference/src/fdiff/schedulers/sde.py:13-246`).  Differences by design:

* Schedulers are immutable `flax.struct` pytrees — scalar hyperparameters are
  traced leaves, so one compiled program serves any (β, σ, G) values.
* `step` takes the reverse-noise sample explicitly (functional PRNG); nothing
  mutates.  The per-step math is identical to the reference Euler–Maruyama
  update: ``x ← x − drift·Δt + √Δt · diag(√β·G) · z``.
* The diagonal diffusion ``diag(G)`` is applied as an elementwise broadcast
  (`G[:, None] * z`) instead of materializing the (T, T) matrix the reference
  builds via `torch.diag_embed` — same result, no O(T²) matmul.

Fourier noise scaling G (reference sde.py:42-58): all entries 1/√2 except the
DC and (even length) Nyquist rows, matching the variance convention of the
orthonormal DFT packing in :mod:`fdtpu.ops.fourier`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


def noise_scaling_vector(max_len: int, fourier_noise_scaling: bool) -> Array:
    """Diagonal scaling G of size ``(max_len,)`` (reference sde.py:42-58)."""
    if not fourier_noise_scaling:
        return jnp.ones((max_len,), dtype=jnp.float32)
    g = jnp.full((max_len,), 1.0 / math.sqrt(2.0), dtype=jnp.float32)
    g = g.at[0].set(1.0)
    if max_len % 2 == 0:
        g = g.at[max_len // 2].set(1.0)
    return g


def noise_scaling_matrix(max_len: int, fourier_noise_scaling: bool) -> Array:
    """Dense diag(G) — only needed for tests / external consumers."""
    return jnp.diag(noise_scaling_vector(max_len, fourier_noise_scaling))


class SDE(struct.PyTreeNode):
    """Base SDE scheduler.  ``G`` must be set via :meth:`with_noise_scaling`."""

    fourier_noise_scaling: bool = struct.field(pytree_node=False, default=False)
    eps: float = struct.field(pytree_node=False, default=1e-5)
    G: Optional[Array] = None

    @property
    def T(self) -> float:
        return 1.0

    def with_noise_scaling(self, max_len: int) -> "SDE":
        """Finish initialization by computing G for a given series length."""
        return self.replace(
            G=noise_scaling_vector(max_len, self.fourier_noise_scaling)
        )

    def _g(self, x: Array) -> Array:
        g = self.G
        if g is None:
            g = noise_scaling_vector(x.shape[1], self.fourier_noise_scaling)
        return g.astype(x.dtype)

    def timesteps(self, num_diffusion_steps: int) -> tuple[Array, Array]:
        """Reverse-time grid ``linspace(1.0, eps, N)`` and the positive step size."""
        ts = jnp.linspace(1.0, self.eps, num_diffusion_steps)
        step_size = ts[0] - ts[1]
        return ts, step_size

    def marginal_prob(self, x: Array, t: Array) -> tuple[Array, Array]:
        raise NotImplementedError

    def step(
        self,
        model_output: Array,
        timestep: Array,
        sample: Array,
        noise: Array,
        step_size: Array,
    ) -> Array:
        raise NotImplementedError

    def add_noise(self, original_samples: Array, noise: Array, t: Array) -> Array:
        """Forward perturbation; ``noise`` is pre-scaled by diag(std) like the
        reference (sde.py:66-77)."""
        mean, _ = self.marginal_prob(original_samples, t)
        return mean + noise

    def prior_sampling(self, key: Array, shape: tuple[int, ...]) -> Array:
        """G·z with z ~ N(0, I) (reference sde.py:79-87)."""
        max_len = shape[1]
        g = self.G
        if g is None:
            g = noise_scaling_vector(max_len, self.fourier_noise_scaling)
        z = jax.random.normal(key, shape)
        return g[None, :, None] * z


class VEScheduler(SDE):
    """Variance-exploding SDE (reference sde.py:90-165)."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0

    def marginal_prob(self, x: Array, t: Array) -> tuple[Array, Array]:
        g = self._g(x)
        sigma_t = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        std = sigma_t.reshape(-1, 1) * g[None, :]
        return x, std

    def prior_sampling(self, key: Array, shape: tuple[int, ...]) -> Array:
        return self.sigma_max * super().prior_sampling(key, shape)

    def step(
        self,
        model_output: Array,
        timestep: Array,
        sample: Array,
        noise: Array,
        step_size: Array,
    ) -> Array:
        g = self._g(sample)
        log_ratio = jnp.log(self.sigma_max / self.sigma_min)
        sqrt_derivative = (
            self.sigma_min
            * jnp.sqrt(2.0 * log_ratio)
            * (self.sigma_max / self.sigma_min) ** timestep
        )
        diffusion = sqrt_derivative * g  # (max_len,)
        drift = -(diffusion**2)[None, :, None] * model_output
        return (
            sample
            - drift * step_size
            + jnp.sqrt(step_size) * diffusion[None, :, None] * noise
        )


class VPScheduler(SDE):
    """Variance-preserving SDE (reference sde.py:168-246)."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    def _log_mean_coeff(self, t: Array) -> Array:
        return -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

    def marginal_prob(self, x: Array, t: Array) -> tuple[Array, Array]:
        g = self._g(x)
        log_mean_coeff = self._log_mean_coeff(t)
        mean = jnp.exp(log_mean_coeff).reshape(
            (-1,) + (1,) * (x.ndim - 1)
        ) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff)).reshape(-1, 1) * g[None, :]
        return mean, std

    def get_beta(self, timestep: Array) -> Array:
        return self.beta_min + timestep * (self.beta_max - self.beta_min)

    def step(
        self,
        model_output: Array,
        timestep: Array,
        sample: Array,
        noise: Array,
        step_size: Array,
    ) -> Array:
        g = self._g(sample)
        beta = self.get_beta(timestep)
        diffusion = jnp.sqrt(beta) * g  # (max_len,)
        drift = -0.5 * beta * sample - (diffusion**2)[None, :, None] * model_output
        return (
            sample
            - drift * step_size
            + jnp.sqrt(step_size) * diffusion[None, :, None] * noise
        )
