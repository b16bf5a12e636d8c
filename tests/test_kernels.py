"""Pallas kernel numerics (interpreter mode on CPU)."""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fdtpu.kernels.attention import _mha_kernel, mha_reference


def fused_mha_interpret(q, k, v, batch_tile=2):
    """Token-major (B, T, H, Dh) fused attention, interpreter mode."""
    b, t, h, dh = q.shape
    spec = pl.BlockSpec(
        (batch_tile, t, h, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_mha_kernel, n_head=h, scale=1.0 / math.sqrt(dh))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b // batch_tile,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=True,
    )(q, k, v)


def test_fused_mha_matches_reference():
    q = jax.random.normal(jax.random.PRNGKey(0), (4, 20, 3, 6))
    k = jax.random.normal(jax.random.PRNGKey(1), (4, 20, 3, 6))
    v = jax.random.normal(jax.random.PRNGKey(2), (4, 20, 3, 6))
    out = fused_mha_interpret(q, k, v)
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_model_attention_matches_head_transposed_formulation():
    """The no-transpose (B,T,H,Dh) einsum attention must equal the classic
    head-major (B,H,T,Dh) formulation."""
    import math as _math

    from fdtpu.models.transformer import _attention

    q = jax.random.normal(jax.random.PRNGKey(3), (4, 20, 3, 6))
    k = jax.random.normal(jax.random.PRNGKey(4), (4, 20, 3, 6))
    v = jax.random.normal(jax.random.PRNGKey(5), (4, 20, 3, 6))
    got = _attention(q, k, v)

    qh, kh, vh = (a.transpose(0, 2, 1, 3) for a in (q, k, v))  # (B,H,T,Dh)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / _math.sqrt(6)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), vh)
    ref = ref.transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_blockdiag_kernel_matches_reference_interpret():
    from fdtpu.kernels.blockdiag_attention import (
        blockdiag_mha,
        blockdiag_mha_reference,
    )

    B, T, H, Dh = 4, 20, 3, 6
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H * Dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Dh, T))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))
    out = blockdiag_mha(q, k, v, q_tile=128, interpret=True)
    ref = blockdiag_mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_blockdiag_kernel_query_tiled_regime_interpret():
    """Long-sequence regime: the per-batch score tensor exceeds the 12MB
    VMEM budget, so the kernel must tile query rows (grid (B, T/tq)) and
    still match XLA.  batch_vmem(1) = 4·T·H·T_pad = 16.8MB > 12MB here."""
    from fdtpu.kernels.blockdiag_attention import (
        blockdiag_mha,
        blockdiag_mha_reference,
    )

    B, T, H, Dh = 2, 1024, 4, 8
    t_pad = 1024
    assert 4 * (T * H * t_pad) > 12 * 1024 * 1024  # forces the tiled path
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H * Dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Dh, T))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))
    out = blockdiag_mha(q, k, v, q_tile=256, interpret=True)
    ref = blockdiag_mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_blockdiag_kernel_bf16_inputs():
    """bf16 inputs must work (scratch packs follow the input dtype) with
    fp32 softmax/accumulation inside — checked against the fp32 reference
    at bf16 tolerance."""
    from fdtpu.kernels.blockdiag_attention import (
        blockdiag_mha,
        blockdiag_mha_reference,
    )

    B, T, H, Dh = 2, 20, 3, 6
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H * Dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Dh, T))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))
    out = blockdiag_mha(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    ref = blockdiag_mha_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=5e-2
    )


def test_blockdiag_model_forward_matches_einsum():
    import dataclasses

    from fdtpu.models import ScoreModelConfig, init_score_model, score_apply

    # Route the model's kernel call through Pallas interpreter mode so the
    # comparison runs on the CPU test backend.
    from fdtpu.kernels import blockdiag_attention as bda

    orig = bda.blockdiag_mha

    def interp(q, k, v, q_tile=256, interpret=False, shift=True):
        return orig(q, k, v, q_tile=q_tile, interpret=True, shift=shift)

    bda.blockdiag_mha = interp
    try:
        cfg = ScoreModelConfig(
            n_channels=2, max_len=16, d_model=12, num_layers=2, n_head=2,
            dim_feedforward=24,
        )
        cfg_bd = dataclasses.replace(cfg, attention_impl="blockdiag")
        variables = init_score_model(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 2))
        t = jnp.full((4,), 0.5)
        s1 = score_apply(variables, cfg, x, t)
        s2 = score_apply(variables, cfg_bd, x, t)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)
    finally:
        bda.blockdiag_mha = orig


def test_blockdiag_trainable_gradients():
    """custom_vjp wrapper: gradients flow and match the XLA formulation
    (Pallas forward AND Pallas backward, interpreter mode)."""
    from fdtpu.kernels import blockdiag_attention as bda

    orig = bda.blockdiag_mha
    orig_bwd = bda.blockdiag_mha_bwd
    bda.blockdiag_mha = lambda q, k, v, q_tile=256, interpret=False, shift=True: orig(
        q, k, v, q_tile=q_tile, interpret=True, shift=shift
    )
    bda.blockdiag_mha_bwd = lambda q, k, v, g, interpret=False: orig_bwd(
        q, k, v, g, interpret=True
    )
    try:
        B, T, H, Dh = 2, 16, 2, 6
        q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H * Dh))
        k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Dh, T))
        v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))

        def loss_kernel(q, k, v):
            return jnp.sum(bda.blockdiag_mha_trainable(q, k, v, 1) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(bda.blockdiag_mha_reference(q, k, v) ** 2)

        g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gk, gr in zip(g_kernel, g_ref):
            np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-3)
    finally:
        bda.blockdiag_mha = orig
        bda.blockdiag_mha_bwd = orig_bwd


def test_blockdiag_bwd_kernel_matches_reference_vjp():
    """The Pallas backward kernel's (dq, dk, dv) equal the XLA reference
    VJP exactly per input layout (fp32 tolerances; interpreter mode)."""
    from fdtpu.kernels.blockdiag_attention import (
        blockdiag_mha_bwd,
        blockdiag_mha_reference,
    )

    B, T, H, Dh = 2, 20, 3, 6
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H * Dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Dh, T))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, H * Dh))

    out = blockdiag_mha_bwd(q, k, v, g, interpret=True)
    _, vjp = jax.vjp(blockdiag_mha_reference, q, k, v)
    ref = vjp(g)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5
        )


def test_blockdiag_bwd_long_sequence_falls_back():
    """Sequences whose fp32 score tensors exceed VMEM route through the
    XLA reference VJP (no Pallas call → runs on CPU without interpret)."""
    from fdtpu.kernels.blockdiag_attention import (
        blockdiag_mha_bwd,
        blockdiag_mha_reference,
    )

    B, T, H, Dh = 1, 600, 12, 6
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H * Dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Dh, T))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, H * Dh))
    out = blockdiag_mha_bwd(q, k, v, g)  # would crash if Pallas on CPU
    _, vjp = jax.vjp(blockdiag_mha_reference, q, k, v)
    for got, want in zip(out, vjp(g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_resolve_attention_impl_auto_is_shape_aware(monkeypatch):
    """"auto" picks the Pallas kernel only on accelerators with tiny heads
    (measured crossover at head_dim 16, throughput.json model_scaling)."""
    from fdtpu.models import score_models as sm

    assert sm.resolve_attention_impl("einsum", 6) == "einsum"
    assert sm.resolve_attention_impl("blockdiag", 32) == "blockdiag"
    # CPU backend (the test environment): always einsum.
    assert sm.resolve_attention_impl("auto", 6) == "einsum"
    monkeypatch.setattr(sm.jax, "default_backend", lambda: "tpu")
    assert sm.resolve_attention_impl("auto", 6) == "blockdiag"
    assert sm.resolve_attention_impl("auto", 8) == "blockdiag"
    assert sm.resolve_attention_impl("auto", 16) == "einsum"
    assert sm.resolve_attention_impl("auto", 32) == "einsum"


def test_blockdiag_kernel_extreme_negative_scores_no_nan():
    """The fused-denominator kernel drops the -inf mask pass: padded score
    columns are exactly 0 (zero K columns), so the per-block max is >= 0.
    With pathologically negative real scores the shifted exp underflows and
    the denominator clamp must yield finite output (0), never NaN."""
    from fdtpu.kernels.blockdiag_attention import blockdiag_mha

    B, T, H, Dh = 2, 20, 3, 6
    # q·k ~ -large: all real scores << -104 so exp underflows to exactly 0.
    q = jnp.ones((B, T, H * Dh)) * 50.0
    k = -jnp.ones((B, H, Dh, T)) * 50.0
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))
    out = blockdiag_mha(q, k, v, interpret=True)
    assert bool(jnp.isfinite(out).all())
    # Moderately negative scores must still average correctly (subnormal-
    # range denominators survive the 1e-30 clamp).
    q2 = jnp.ones((B, T, H * Dh)) * 3.0
    k2 = -jnp.ones((B, H, Dh, T)) * 3.0
    out2 = blockdiag_mha(q2, k2, v, interpret=True)
    from fdtpu.kernels.blockdiag_attention import blockdiag_mha_reference

    ref2 = blockdiag_mha_reference(q2, k2, v)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4)


def test_blockdiag_noshift_matches_shifted_interpret():
    """shift=False (no per-block max subtraction) is exact while logits are
    bounded — same weights, denominator, and output as the shifted kernel."""
    from fdtpu.kernels import blockdiag_attention as bda

    B, T, H, Dh = 2, 16, 2, 6
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H * Dh))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, Dh, T))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, Dh))
    a = bda.blockdiag_mha(q, k, v, interpret=True)
    b = bda.blockdiag_mha(q, k, v, interpret=True, shift=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
