"""Matmul-DFT path: must agree with the FFT path to float32 precision.

The accelerator path uses the packed-DFT matrix on the MXU (the axon TPU
runtime has no FFT op); these tests pin its equivalence on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.ops import dft, idft, frequency_decompose_fft, frequency_scale
from fdtpu.ops.fourier import packed_dft_matrix, packed_idft_matrix


@pytest.mark.parametrize("max_len", [20, 21, 100, 187, 365])
def test_matmul_dft_matches_fft(max_len):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, max_len, 3))
    np.testing.assert_allclose(
        dft(x, impl="matmul"), dft(x, impl="fft"), atol=2e-4
    )
    xt = dft(x, impl="fft")
    np.testing.assert_allclose(
        idft(xt, impl="matmul"), idft(xt, impl="fft"), atol=2e-4
    )


@pytest.mark.parametrize("max_len", [20, 21, 187])
def test_matmul_roundtrip(max_len):
    x = jax.random.normal(jax.random.PRNGKey(1), (4, max_len, 2))
    np.testing.assert_allclose(
        idft(dft(x, impl="matmul"), impl="matmul"), x, atol=2e-4
    )


@pytest.mark.parametrize("max_len", [20, 21])
def test_idft_matrix_is_exact_inverse(max_len):
    f = np.asarray(packed_dft_matrix(max_len, jnp.float64))
    f_inv = np.asarray(packed_idft_matrix(max_len, jnp.float64))
    np.testing.assert_allclose(f @ f_inv, np.eye(max_len), atol=1e-5)


def test_frequency_decompose_matmul_matches_fft():
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 40, 8))
    lo_m, hi_m = frequency_decompose_fft(x, 0.3, impl="matmul")
    lo_f, hi_f = frequency_decompose_fft(x, 0.3, impl="fft")
    np.testing.assert_allclose(lo_m, lo_f, atol=2e-4)
    np.testing.assert_allclose(hi_m, hi_f, atol=2e-4)


@pytest.mark.parametrize("strategy", ["spatial", "energy"])
def test_frequency_scale_matmul_matches_fft(strategy):
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 50, 2))
    y_m = frequency_scale(x, 1.0, 1.5, 0.5, strategy, impl="matmul")
    y_f = frequency_scale(x, 1.0, 1.5, 0.5, strategy, impl="fft")
    np.testing.assert_allclose(y_m, y_f, atol=2e-4)
