"""Pallas fused per-head attention (reference kernel).

Keeps each batch-tile's Q/K/V and the per-head score matrix entirely in
VMEM: QK^T → softmax(f32) → AV fused, nothing spilled.  At tiny head dims
(Dh=6) it only *matches* XLA — the per-head (T, Dh) dots are
MXU-latency-bound — so the production path is
:mod:`fdtpu.kernels.blockdiag_attention`, which packs all heads into two
large matmuls and measures ~1.3× faster end to end.  This kernel is kept as
the straightforward formulation (numerics ground truth in tests, and the
better starting point for models with wide heads).

Layout matches the model: ``(B, T, H, Dh)`` token-major, no head transposes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def mha_reference(q: Array, k: Array, v: Array) -> Array:
    """Plain-XLA attention over (B, T, H, Dh); numerics ground truth."""
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, n_head: int, scale: float):
    bt = q_ref.shape[0]
    for b in range(bt):
        for h in range(n_head):
            q = q_ref[b, :, h, :]  # (T, Dh)
            k = k_ref[b, :, h, :]
            v = v_ref[b, :, h, :]
            scores = (
                jax.lax.dot_general(
                    q,
                    k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )  # (T, T) f32, lives in VMEM only
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            weights = jnp.exp(scores)
            weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
            o_ref[b, :, h, :] = jnp.dot(
                weights.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def fused_mha(
    q: Array, k: Array, v: Array, batch_tile: int = 4, interpret: bool = False
) -> Array:
    """Fused attention over ``(B, T, H, Dh)``.

    Falls back to :func:`mha_reference` when the batch doesn't tile evenly.
    """
    b, t, h, dh = q.shape
    if b % batch_tile != 0:
        return mha_reference(q, k, v)
    grid = (b // batch_tile,)
    spec = pl.BlockSpec(
        (batch_tile, t, h, dh),
        lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_mha_kernel, n_head=h, scale=1.0 / math.sqrt(dh))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)
