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
