"""Block-diagonal fused attention: all heads in two large MXU matmuls.

The flagship model's heads are tiny (Dh=6), so per-head score/AV dots are
MXU-latency-bound (24 small dots per batch element).  This kernel packs the
per-head K/V slabs into block-diagonal matrices in VMEM:

    K_bd (D, H·T')     with K_bd[h·Dh:(h+1)·Dh, h·T':h·T'+T] = k_h^T
    V_bd (H·T', D+H)   with V_bd[h·T':h·T'+T, h·Dh:(h+1)·Dh] = v_h
                        and V_bd[h·T':h·T'+T, D+h] = 1   (ones columns)

so that ONE matmul  scores = q (TQ, D) @ K_bd  yields every head's score
block side by side (the zero rows of other heads contribute nothing), and
ONE matmul  raw = exp_weights @ V_bd  produces both the merged unnormalized
(TQ, D) output AND, in the H extra ones-columns, every head's softmax
denominator — so the softmax sum-reduce and wide divide run on the MXU for
free instead of as VPU passes over the (TQ, H·T') weight tensor (measured
1.4× kernel speedup at the flagship shape; the D+H extra lanes are free,
the physical lane width is 128 either way).

T' is padded to a multiple of 128.  No −inf masking is needed: padded /
unwritten K_bd columns are zero, so padded score columns are exactly 0 —
they raise the per-block max to ≥0 (harmless shift) and contribute nothing
to the output or denominator because the corresponding V_bd rows and
ones-column entries are zero.  (Degenerate case: if every real score in a
block is < −88 the shifted exp underflows and the denominator clamps at
1e-30, giving 0 instead of the true tiny average — impossible for sane
inputs since scores are O(‖q‖‖k‖/√Dh).)

Queries are processed in row tiles so long sequences (e.g. 501-step NASA
charge) stay inside VMEM; the packed K_bd/V_bd are built once per batch
element and reused across query tiles (grid cells run sequentially on the
TensorCore, scratch persists).
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


def _expand_heads(n_head: int, head_dim: int, dtype) -> Array:
    """(H, H·Dh) 0/1 matrix with E[h, d] = 1 iff d // Dh == h; a tiny MXU
    matmul (per-head reciprocals) @ E broadcasts each head's value across
    its Dh output channels."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_head, n_head * head_dim), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_head, n_head * head_dim), 1)
    return (cols // head_dim == rows).astype(dtype)


def _softmax_av(weights_exp, vbd, *, n_head: int, head_dim: int):
    """Finish attention from exp-weights: one MXU matmul yields the merged
    unnormalized output and (ones columns) the per-head denominators."""
    d = n_head * head_dim
    raw = jnp.dot(
        weights_exp.astype(vbd.dtype), vbd,
        preferred_element_type=jnp.float32,
    )  # (TQ, D+H)
    denom = jnp.maximum(raw[:, d:d + n_head], 1e-30)
    recip = jnp.dot(
        1.0 / denom, _expand_heads(n_head, head_dim, jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (TQ, D)
    return raw[:, :d] * recip


def _bd_kernel(q_ref, k_ref, v_ref, o_ref, kbd_ref, vbd_ref, *,
               n_head: int, head_dim: int, seq: int, t_pad: int, scale: float,
               shift: bool = True):
    j = pl.program_id(1)
    d = n_head * head_dim

    # Zero the off-block scratch regions and write the constant ones
    # columns ONCE: scratch persists across the sequential grid cells, and
    # the diagonal blocks are overwritten per batch element while
    # everything off-diagonal stays zero.
    @pl.when((pl.program_id(0) == 0) & (j == 0))
    def _():
        kbd_ref[:] = jnp.zeros_like(kbd_ref)
        vbd_ref[:] = jnp.zeros_like(vbd_ref)
        for h in range(n_head):
            vbd_ref[h * t_pad:h * t_pad + seq, d + h] = jnp.ones(
                (seq,), vbd_ref.dtype
            )

    # Pack this batch element's block-diagonal K and V at the first q-tile
    # (static offsets → static strided stores).
    @pl.when(j == 0)
    def _():
        for h in range(n_head):
            kbd_ref[h * head_dim:(h + 1) * head_dim, h * t_pad:h * t_pad + seq] = (
                k_ref[0, h]
            )
            vbd_ref[h * t_pad:h * t_pad + seq, h * head_dim:(h + 1) * head_dim] = (
                v_ref[0, h]
            )

    tq = q_ref.shape[1]
    scores = jax.lax.dot_general(
        q_ref[0], kbd_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (TQ, H·T'); padded/unwritten key columns score exactly 0

    s3 = scores.reshape(tq, n_head, t_pad)
    w3 = jnp.exp(s3 - jnp.max(s3, axis=-1, keepdims=True)) if shift else jnp.exp(s3)
    out = _softmax_av(
        w3.reshape(tq, n_head * t_pad), vbd_ref[:],
        n_head=n_head, head_dim=head_dim,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _bd_kernel_batch(q_ref, k_ref, v_ref, o_ref, kbd_ref, vbd_ref, *,
                     n_head: int, head_dim: int, seq: int, t_pad: int,
                     scale: float, shift: bool = True):
    """Batch-tiled variant: whole (unpadded) query range per cell, several
    batch elements per cell for cross-element pipelining."""
    bt = q_ref.shape[0]
    d = n_head * head_dim

    @pl.when(pl.program_id(0) == 0)
    def _():
        kbd_ref[:] = jnp.zeros_like(kbd_ref)
        vbd_ref[:] = jnp.zeros_like(vbd_ref)
        for h in range(n_head):
            vbd_ref[h * t_pad:h * t_pad + seq, d + h] = jnp.ones(
                (seq,), vbd_ref.dtype
            )

    for b in range(bt):
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
        ) * scale
        s3 = scores.reshape(seq, n_head, t_pad)
        # shift=False drops the per-block max pass (one of the two
        # remaining VPU passes) but is only exact while max|s| ≪ 88 (fp32
        # exp overflow).  MEASURED AND REJECTED for the sampling chain:
        # on the trained flagship at the headline protocol (T=1000) the
        # shift-free chain goes NON-FINITE — some step's logits exceed the
        # overflow bound — while the shifted chain stays finite
        # (docs/benchmarks/noshift_exp.json, round 5).  Keep shift=True
        # (the default) for any full diffusion chain; shift=False remains
        # only for bounded-logit micro-benchmarks.
        w3 = jnp.exp(s3 - jnp.max(s3, axis=-1, keepdims=True)) if shift else jnp.exp(s3)
        out = _softmax_av(
            w3.reshape(seq, n_head * t_pad), vbd_ref[:],
            n_head=n_head, head_dim=head_dim,
        )
        o_ref[b] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret", "shift"))
def blockdiag_mha(
    q: Array, k: Array, v: Array, q_tile: int = 256, interpret: bool = False,
    shift: bool = True,
) -> Array:
    """Fused block-diagonal attention.

    Args:
        q: ``(B, T, D)`` — token-major queries (merged heads).
        k: ``(B, H, Dh, T)`` — per-head transposed keys.
        v: ``(B, H, T, Dh)`` — per-head values.
        q_tile: query rows per grid cell in the long-sequence regime.
        shift: subtract the per-block max before exp (standard softmax
            stabilization).  ``False`` drops that VPU pass — only safe
            when the model's attention logits are bounded well below the
            fp32 exp overflow (~88).  Measured and REJECTED for diffusion
            sampling chains: the trained flagship's T=1000 chain goes
            non-finite under ``shift=False``
            (docs/benchmarks/noshift_exp.json).

    Returns:
        ``(B, T, D)`` merged attention output.

    Two regimes: short sequences process the whole query range with two
    batch elements per grid cell (cross-element pipelining); long sequences
    tile the query rows and rebuild the K/V packs once per batch element.
    """
    b, t, d = q.shape
    h, dh = k.shape[1], k.shape[2]
    t_pad = _round_up(t, 128)
    budget = 12 * 1024 * 1024
    # The block-diagonal packs live in scratch at the INPUT dtype (bf16
    # halves their footprint); scores/weights are always fp32.
    isz = jnp.dtype(q.dtype).itemsize
    # V_bd carries H extra ones-columns for the fused softmax denominator.
    pack_bytes = isz * (d * h * t_pad + h * t_pad * (d + h))

    def batch_vmem(bt_: int) -> int:
        return 4 * (bt_ * t * h * t_pad) + pack_bytes + isz * 4 * bt_ * t * d

    scratch = [
        pltpu.VMEM((d, h * t_pad), q.dtype),
        pltpu.VMEM((h * t_pad, d + h), q.dtype),
    ]
    common = dict(n_head=h, head_dim=dh, seq=t, t_pad=t_pad,
                  scale=1.0 / math.sqrt(dh), shift=shift)

    bt = 2 if b % 2 == 0 else 1
    if batch_vmem(bt) <= budget or batch_vmem(bt := 1) <= budget:
        return pl.pallas_call(
            functools.partial(_bd_kernel_batch, **common),
            out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
            grid=(b // bt,),
            in_specs=[
                pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, h, dh, t), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, h, t, dh), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, t, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
            interpret=interpret,
        )(q, k, v)

    # Long-sequence regime: tile query rows.
    tq = min(q_tile, t_pad)

    def tiled_vmem(tq_: int) -> int:
        return 4 * (tq_ * h * t_pad) + pack_bytes + isz * (2 * tq_ * d + 2 * h * dh * t)

    while tq > 128 and tiled_vmem(tq) > budget:
        tq //= 2
    if tiled_vmem(tq) > budget:
        return blockdiag_mha_reference(q, k, v)

    return pl.pallas_call(
        functools.partial(_bd_kernel, **common),
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        grid=(b, pl.cdiv(t, tq)),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dh, t), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t, dh), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, k, v)


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


def _bd_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                   kbd_ref, vbd_ref, *, n_head: int, head_dim: int, seq: int,
                   t_pad: int, scale: float):
    """Block-diagonal attention backward, one batch element per grid cell.

    Same packing trick as the forward: with K_bd/V_bd in VMEM the whole
    backward is five full-width MXU matmuls (recomputed scores, dW, dQ,
    dK, dV) instead of 5·H tiny per-head dots —

        W  = softmax(q @ K_bd · scale)       (recompute, cheap)
        dW = g @ V_bdᵀ                        dS = W ⊙ (dW − Σ dW⊙W) · scale
        dq = dS @ K_bdᵀ    dkᵀ = qᵀ @ dS[blk]    dv = (Wᵀ @ g)[blk]
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        kbd_ref[:] = jnp.zeros_like(kbd_ref)
        vbd_ref[:] = jnp.zeros_like(vbd_ref)

    for h in range(n_head):
        kbd_ref[h * head_dim:(h + 1) * head_dim, h * t_pad:h * t_pad + seq] = (
            k_ref[0, h]
        )
        vbd_ref[h * t_pad:h * t_pad + seq, h * head_dim:(h + 1) * head_dim] = (
            v_ref[0, h]
        )

    q = q_ref[0]
    g = g_ref[0]
    scores = jax.lax.dot_general(
        q, kbd_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (T, H·T')
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where((col % t_pad) < seq, scores, -jnp.inf)
    s3 = scores.reshape(seq, n_head, t_pad)
    s3 = s3 - jnp.max(s3, axis=-1, keepdims=True)
    w3 = jnp.exp(s3)
    w3 = w3 / jnp.sum(w3, axis=-1, keepdims=True)  # (T, H, T') fp32

    # dW = g @ V_bdᵀ — the zero off-block rows of V_bd confine each block's
    # contraction to its own head's channels.
    dw = jax.lax.dot_general(
        g, vbd_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, H·T')
    dw3 = dw.reshape(seq, n_head, t_pad)
    r = jnp.sum(dw3 * w3, axis=-1, keepdims=True)
    ds = ((w3 * (dw3 - r)) * scale).reshape(seq, n_head * t_pad)
    ds_c = ds.astype(kbd_ref.dtype)
    w_c = w3.reshape(seq, n_head * t_pad).astype(vbd_ref.dtype)

    dq_ref[0] = jax.lax.dot_general(
        ds_c, kbd_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)  # (T, D)

    gq = jax.lax.dot_general(
        q, ds_c, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, H·T') — block (h, h) is dk_hᵀ
    gv = jax.lax.dot_general(
        w_c, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H·T', D) — block (h, h) is dv_h
    for h in range(n_head):
        dk_ref[0, h] = gq[
            h * head_dim:(h + 1) * head_dim, h * t_pad:h * t_pad + seq
        ].astype(dk_ref.dtype)
        dv_ref[0, h] = gv[
            h * t_pad:h * t_pad + seq, h * head_dim:(h + 1) * head_dim
        ].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blockdiag_mha_bwd(
    q: Array, k: Array, v: Array, g: Array, interpret: bool = False
) -> tuple[Array, Array, Array]:
    """Pallas backward for :func:`blockdiag_mha` (same input layouts;
    ``g`` is the cotangent of the merged (B, T, D) output).  Falls back to
    the XLA reference VJP when the fp32 score/weight tensors would not fit
    VMEM (long sequences)."""
    b, t, d = q.shape
    h, dh = k.shape[1], k.shape[2]
    t_pad = _round_up(t, 128)
    isz = jnp.dtype(q.dtype).itemsize
    pack_bytes = isz * 2 * d * h * t_pad
    # W, dW, dS coexist in fp32 plus the packs and the io slabs.
    vmem = 4 * 3 * t * h * t_pad + pack_bytes + isz * (4 * t * d + 4 * h * dh * t)
    if vmem > 12 * 1024 * 1024:
        _, vjp = jax.vjp(blockdiag_mha_reference, q, k, v)
        return vjp(g)

    return pl.pallas_call(
        functools.partial(
            _bd_bwd_kernel, n_head=h, head_dim=dh, seq=t, t_pad=t_pad,
            scale=1.0 / math.sqrt(dh),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, dh, t), k.dtype),
            jax.ShapeDtypeStruct((b, h, t, dh), v.dtype),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dh, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dh, t), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((d, h * t_pad), q.dtype),
            pltpu.VMEM((h * t_pad, d), q.dtype),
        ],
        interpret=interpret,
    )(q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def blockdiag_mha_trainable(
    q: Array, k: Array, v: Array, q_tile: int = 256, shift: bool = True
) -> Array:
    """Differentiable wrapper: fused Pallas forward AND backward.

    The backward re-derives the attention weights inside the same
    block-diagonal packing (five full-width MXU matmuls) instead of paying
    XLA recomputation over 5·H per-head dots; long sequences that exceed
    VMEM fall back to the XLA reference VJP.  ``shift`` only affects the
    forward (the backward's softmax recompute is shift-invariant)."""
    return blockdiag_mha(q, k, v, q_tile=q_tile, shift=shift)


def _bd_fwd(q, k, v, q_tile, shift):
    return blockdiag_mha(q, k, v, q_tile=q_tile, shift=shift), (q, k, v)


def _bd_bwd(q_tile, shift, residuals, g):
    q, k, v = residuals
    return blockdiag_mha_bwd(q, k, v, g)


blockdiag_mha_trainable.defvjp(_bd_fwd, _bd_bwd)
