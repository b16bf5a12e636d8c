"""Positional / diffusion-time encodings (functional init + apply).

TPU-native redesign of `/root/reference/src/fdiff/models/transformer.py:8-91`:

* ``PositionalEncoding``: learnable embedding table with max-norm √d applied
  functionally at lookup (torch renormalizes the stored rows in-place;
  the forward result is identical).
* ``TimeEncoding``: learnable per-integer-timestep embedding (used by
  discrete-time schedulers for parity; SDE models use the GFP below).
* ``GaussianFourierProjection``: fixed random weights W ~ N(0,1)·scale
  (non-trainable, kept in a separate ``constants`` subtree so the optimizer
  never touches them — reference transformer.py:71-73 sets requires_grad=False),
  sin/cos features, then a learnable dense projection.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from fdtpu.models.initializers import embedding_init, linear_init, max_norm_rows

Array = jax.Array
Params = dict[str, Any]


# ---------------------------------------------------------------- positional
def init_positional_encoding(key: Array, d_model: int, max_len: int) -> Params:
    return {"embedding": embedding_init(key, max_len, d_model)}


def apply_positional_encoding(params: Params, x: Array) -> Array:
    """x: (B, L, D) → x + PE[:L] with row norms clipped at √d."""
    d_model = x.shape[-1]
    table = max_norm_rows(params["embedding"], math.sqrt(d_model))
    return x + table[None, : x.shape[1], :]


# ---------------------------------------------------------------- discrete time
def init_time_encoding(key: Array, d_model: int, max_time: int) -> Params:
    return {"embedding": embedding_init(key, max_time, d_model)}


def apply_time_encoding(
    params: Params, x: Array, timesteps: Array, use_time_axis: bool = True
) -> Array:
    d_model = x.shape[-1]
    table = max_norm_rows(params["embedding"], math.sqrt(d_model))
    t_emb = table[timesteps.astype(jnp.int32)]  # (B, D)
    if use_time_axis:
        t_emb = t_emb[:, None, :]
    return x + t_emb


# ---------------------------------------------------------------- Gaussian Fourier
def init_gaussian_fourier_projection(
    key: Array, d_model: int, scale: float = 30.0
) -> tuple[Params, Params]:
    """Returns (trainable params, constants).  W is frozen (reference
    transformer.py:71-73)."""
    k_w, k_dense = jax.random.split(key)
    w = jax.random.normal(k_w, ((d_model + 1) // 2,)) * scale
    dense_w, dense_b = linear_init(k_dense, d_model, d_model)
    return {"dense_w": dense_w, "dense_b": dense_b}, {"W": w}


def apply_gaussian_fourier_projection(
    params: Params,
    constants: Params,
    x: Array,
    timesteps: Array,
    use_time_axis: bool = True,
) -> Array:
    """x + Dense(concat(sin, cos)(2π·t·W))[:d_model] (reference transformer.py:77-91).

    The trig arguments reach |2π·t·W| ≈ 200 (W ~ N(0,1)·30), so the phase is
    computed in float32 regardless of the compute dtype — bf16 phases would
    corrupt the time conditioning entirely.
    """
    d_model = params["dense_w"].shape[0]
    time_proj = (
        timesteps.astype(jnp.float32)[:, None]
        * constants["W"].astype(jnp.float32)[None, :]
        * 2.0
        * jnp.pi
    )
    emb = jnp.concatenate([jnp.sin(time_proj), jnp.cos(time_proj)], axis=-1)
    t_emb = emb[:, :d_model].astype(params["dense_w"].dtype)
    projected = t_emb @ params["dense_w"] + params["dense_b"]
    if use_time_axis:
        projected = projected[:, None, :]
    return x + projected
