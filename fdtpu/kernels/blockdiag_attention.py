"""Block-diagonal fused attention: all heads in two large MXU matmuls.

The flagship model's heads are tiny (Dh=6), so per-head score/AV dots are
MXU-latency-bound (24 small dots per batch element).  This kernel packs the
per-head K/V slabs into block-diagonal matrices in VMEM:

    K_bd (D, H·T')   with K_bd[h·Dh:(h+1)·Dh, h·T':h·T'+T] = k_h^T
    V_bd (H·T', D)   with V_bd[h·T':h·T'+T, h·Dh:(h+1)·Dh] = v_h

so that ONE matmul  scores = q (T, D) @ K_bd  yields every head's (T, T)
score block side by side (the zero rows of other heads contribute nothing),
and ONE matmul  out = weights @ V_bd  produces the merged (T, D) output.
T' is padded to a multiple of 128; padded key columns are masked to -inf
before the fused softmax.  Everything stays in VMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bd_kernel(q_ref, k_ref, v_ref, o_ref, kbd_ref, vbd_ref, *,
               n_head: int, head_dim: int, seq: int, t_pad: int, scale: float):
    bt = q_ref.shape[0]
    d = n_head * head_dim

    # Zero the off-block regions ONCE: scratch persists across the sequential
    # grid cells on TPU, and the diagonal blocks are overwritten every
    # iteration while everything off-diagonal stays zero.
    @pl.when(pl.program_id(0) == 0)
    def _():
        kbd_ref[:] = jnp.zeros_like(kbd_ref)
        vbd_ref[:] = jnp.zeros_like(vbd_ref)

    for b in range(bt):
        # Pack block-diagonal K and V (static offsets → static strided stores).
        for h in range(n_head):
            kbd_ref[h * head_dim:(h + 1) * head_dim, h * t_pad:h * t_pad + seq] = (
                k_ref[b, h]
            )
            vbd_ref[h * t_pad:h * t_pad + seq, h * head_dim:(h + 1) * head_dim] = (
                v_ref[b, h]
            )

        scores = jax.lax.dot_general(
            q_ref[b], kbd_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (T, H·T')

        # Mask padded key positions within each block.
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        in_block = (col % t_pad) < seq
        scores = jnp.where(in_block, scores, -jnp.inf)

        # Per-row-per-block softmax == plain row softmax here, because each
        # row's finite entries across DIFFERENT blocks must be normalized
        # per block.  Reshape the lane axis into (H, T') to softmax per block.
        s3 = scores.reshape(seq, n_head, t_pad)
        s3 = s3 - jnp.max(s3, axis=-1, keepdims=True)
        w3 = jnp.exp(s3)
        w3 = w3 / jnp.sum(w3, axis=-1, keepdims=True)
        weights = w3.reshape(seq, n_head * t_pad)

        o_ref[b] = jnp.dot(
            weights.astype(vbd_ref.dtype), vbd_ref[:],
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("batch_tile", "interpret"))
def blockdiag_mha(
    q: Array, k: Array, v: Array, batch_tile: int = 1, interpret: bool = False
) -> Array:
    """Fused block-diagonal attention.

    Args:
        q: ``(B, T, D)`` — token-major queries (merged heads).
        k: ``(B, H, Dh, T)`` — per-head transposed keys.
        v: ``(B, H, T, Dh)`` — per-head values.

    Returns:
        ``(B, T, D)`` merged attention output.
    """
    b, t, d = q.shape
    h, dh = k.shape[1], k.shape[2]
    t_pad = _round_up(t, 128)

    # VMEM budget: scores (t, h·t_pad) f32 (possibly one live copy per
    # unrolled tile iteration) + the two block-diagonal packs + in/out slabs
    # must fit ~16 MB.  Shrink the batch tile first; very long sequences
    # (e.g. 501-step NASA charge at large d_model) fall back to XLA.
    def vmem_bytes(bt: int) -> int:
        return 4 * (
            bt * t * h * t_pad  # scores (dominant)
            + 2 * d * h * t_pad  # K_bd + V_bd
            + 4 * bt * t * d  # q/k/v/out slabs
        )

    budget = 12 * 1024 * 1024
    while batch_tile > 1 and (b % batch_tile != 0 or vmem_bytes(batch_tile) > budget):
        batch_tile -= 1
    if b % batch_tile != 0 or vmem_bytes(batch_tile) > budget:
        return blockdiag_mha_reference(q, k, v)

    grid = (b // batch_tile,)
    out = pl.pallas_call(
        functools.partial(
            _bd_kernel, n_head=h, head_dim=dh, seq=t, t_pad=t_pad,
            scale=1.0 / math.sqrt(dh),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, h, dh, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, h, t, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((d, h * t_pad), jnp.float32),
            pltpu.VMEM((h * t_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out


def blockdiag_mha_reference(q: Array, k: Array, v: Array) -> Array:
    """XLA ground truth for the block-diagonal layout inputs."""
    b, t, d = q.shape
    h, dh = k.shape[1], k.shape[2]
    qh = q.reshape(b, t, h, dh)
    scores = jnp.einsum("bqhd,bhdk->bhqk", qh, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(dh)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bqhd", weights, v)
    return out.reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def blockdiag_mha_trainable(q: Array, k: Array, v: Array, batch_tile: int = 2) -> Array:
    """Differentiable wrapper: fused Pallas forward, XLA backward.

    The backward recomputes the (cheap) attention weights with XLA einsums and
    differentiates through them — the forward still avoids materializing the
    score tensor in HBM, which is where the time goes."""
    return blockdiag_mha(q, k, v, batch_tile=batch_tile)


def _bd_fwd(q, k, v, batch_tile):
    return blockdiag_mha(q, k, v, batch_tile=batch_tile), (q, k, v)


def _bd_bwd(batch_tile, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(blockdiag_mha_reference, q, k, v)
    return vjp(g)


blockdiag_mha_trainable.defvjp(_bd_fwd, _bd_bwd)
