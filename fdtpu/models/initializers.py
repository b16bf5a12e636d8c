"""Parameter initializers matching the reference's torch defaults.

The reference relies on torch layer defaults (nn.Linear kaiming-uniform ≡
U(±1/√fan_in), nn.Embedding N(0,1), nn.MultiheadAttention xavier-uniform
in-proj with zero biases).  Matching them keeps training dynamics and the
distributional parity tests comparable with the PyTorch implementation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def linear_init(
    key: Array, fan_in: int, fan_out: int, dtype=jnp.float32
) -> tuple[Array, Array]:
    """torch nn.Linear default: W, b ~ U(±1/√fan_in).  Returns (W (in,out), b)."""
    k_w, k_b = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(k_w, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(k_b, (fan_out,), dtype, -bound, bound)
    return w, b


def embedding_init(key: Array, num: int, dim: int, dtype=jnp.float32) -> Array:
    """torch nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, (num, dim), dtype)


def xavier_uniform(key: Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> Array:
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -bound, bound)


def max_norm_rows(table: Array, max_norm: float, eps: float = 1e-7) -> Array:
    """Row-wise norm clipping, the functional analog of torch Embedding
    ``max_norm`` renormalization at lookup time."""
    norms = jnp.linalg.norm(table, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_norm / (norms + eps))
    return table * scale
