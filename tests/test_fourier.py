"""Spectral-ops tests (mirrors reference tests/test_utils.py:36-51 and extends)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.ops import (
    dft,
    idft,
    spectral_density,
    localization_metrics,
    smooth_frequency,
    frequency_decompose_fft,
    hermite_polynomials,
    predict_hermite,
)

BATCH, CHANNELS = 8, 3


@pytest.mark.parametrize("max_len", [20, 21, 100, 187])
def test_dft_idft_roundtrip(max_len):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (BATCH, max_len, CHANNELS))
    np.testing.assert_allclose(idft(dft(x)), x, atol=1e-5)
    np.testing.assert_allclose(dft(idft(x)), x, atol=1e-5)


@pytest.mark.parametrize("max_len", [20, 21])
def test_dft_matches_numpy_packing(max_len):
    key = jax.random.PRNGKey(1)
    x = np.asarray(jax.random.normal(key, (2, max_len, 1)))
    xf = np.fft.rfft(x, axis=1, norm="ortho")
    re = np.real(xf)
    im = np.imag(xf)[:, 1:, :]
    if max_len % 2 == 0:
        im = im[:, :-1, :]
    expected = np.concatenate([re, im], axis=1)
    np.testing.assert_allclose(dft(jnp.asarray(x)), expected, atol=1e-6)


def test_parseval_energy_preserved():
    """Orthonormal transform: ||x||² == ||dft(x)||² (up to packing of conjugates)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (4, 33, 2))
    # Energy in the packed representation counts each +/- frequency pair once
    # with weight 1 for (Re² + Im²) of rfft(ortho); verify via spectral density
    # mirrored sum instead: sum over full spectrum equals time-domain energy.
    dens = spectral_density(x)  # (B, Nyq+1, C)
    max_len = x.shape[1]
    mirror = jnp.flip(dens[:, 1:, :], axis=1) if max_len % 2 else jnp.flip(dens[:, 1:-1, :], axis=1)
    total = jnp.sum(dens, axis=1) + jnp.sum(mirror, axis=1)
    np.testing.assert_allclose(total, jnp.sum(x**2, axis=1), rtol=1e-4)


def test_spectral_density_shape_and_nonneg():
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 24, 2))
    dens = spectral_density(x)
    assert dens.shape == (5, 13, 2)
    assert (np.asarray(dens) >= 0).all()


def test_localization_metrics_shapes():
    x = jax.random.normal(jax.random.PRNGKey(4), (6, 30, 1))
    t_loc, f_loc = localization_metrics(x)
    assert t_loc.shape == (6,)
    assert f_loc.shape == (6,)
    # A pure impulse is maximally localized in time.
    imp = jnp.zeros((1, 30, 1)).at[0, 15, 0].set(1.0)
    t_imp, _ = localization_metrics(imp)
    assert float(t_imp[0]) < float(t_loc.mean())


def test_smooth_frequency_preserves_shape_and_smooths():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (4, 64, 1))
    y = smooth_frequency(x, sigma=3.0)
    assert y.shape == x.shape
    # Smoothing must reduce high-frequency energy share.
    def hf_energy(z):
        d = spectral_density(z)
        return float(jnp.sum(d[:, 20:, :]) / jnp.sum(d))
    assert hf_energy(y) < hf_energy(x)


def test_frequency_decompose_sums_to_identity():
    x = jax.random.normal(jax.random.PRNGKey(6), (3, 40, 8))
    lo, hi = frequency_decompose_fft(x, low_freq_ratio=0.3)
    np.testing.assert_allclose(lo + hi, x, atol=1e-5)
    # Low part keeps the mean (DC), high part is zero-mean.
    np.testing.assert_allclose(hi.mean(axis=1), 0.0, atol=1e-5)


def test_hermite_polynomials_values():
    s = jnp.array([-1.0, 0.0, 0.5, 1.0])
    h = hermite_polynomials(s, order=3)
    np.testing.assert_allclose(h[0], jnp.ones(4), atol=1e-6)
    np.testing.assert_allclose(h[1], 2 * s, atol=1e-6)
    np.testing.assert_allclose(h[2], 4 * s**2 - 2, atol=1e-6)
    np.testing.assert_allclose(h[3], 8 * s**3 - 12 * s, atol=1e-6)


def test_predict_hermite_recovers_polynomial():
    # History follows a quadratic in t; the Hermite lstsq should recover it
    # at an intermediate target (targets are clipped to the history range,
    # matching reference fourier.py:433).
    ts = jnp.array([0.0, 0.25, 0.5, 0.75, 1.0])
    feats = jnp.stack([(2 * t**2 - t + 1) * jnp.ones((4, 3)) for t in ts])
    pred = predict_hermite(feats, ts, jnp.asarray(0.875), order=2)
    expected = 2 * 0.875**2 - 0.875 + 1
    np.testing.assert_allclose(pred, expected * jnp.ones((4, 3)), rtol=1e-3)
    # Beyond-range targets clamp to the boundary value (reference behavior).
    pred_clamped = predict_hermite(feats, ts, jnp.asarray(1.25), order=2)
    np.testing.assert_allclose(pred_clamped, 2.0 * jnp.ones((4, 3)), rtol=1e-3)


def test_predict_hermite_valid_mask_ignores_padding():
    # A fixed-size ring not yet full carries zero-padded rows at the front;
    # the valid mask must exclude them or they enter the fit as real
    # observations at t=0 and corrupt the coefficients.
    ts_live = jnp.array([0.5, 0.75, 1.0])
    feats_live = jnp.stack([(3 * t - 1) * jnp.ones((2,)) for t in ts_live])
    ts = jnp.concatenate([jnp.zeros((2,)), ts_live])
    feats = jnp.concatenate([jnp.zeros((2, 2)), feats_live])
    valid = jnp.array([False, False, True, True, True])
    pred = predict_hermite(feats, ts, jnp.asarray(0.875), order=1, valid=valid)
    np.testing.assert_allclose(pred, (3 * 0.875 - 1) * jnp.ones((2,)), rtol=1e-3)
    # Without the mask the zero rows drag the fit off the line.
    bad = predict_hermite(feats, ts, jnp.asarray(0.875), order=1)
    err_masked = abs(float(pred[0]) - (3 * 0.875 - 1))
    err_unmasked = abs(float(bad[0]) - (3 * 0.875 - 1))
    assert err_unmasked > 10 * max(err_masked, 1e-6)


def test_predict_hermite_unclipped_extrapolates():
    # clip_target=False evaluates the fitted polynomial at the TRUE target
    # beyond the history span (the live FreqCa ε̂-predictor path), instead
    # of saturating at the span edge like the reference.
    ts = jnp.array([0.0, 0.25, 0.5, 0.75, 1.0])
    feats = jnp.stack([(3 * t - 1) * jnp.ones((2,)) for t in ts])
    pred = predict_hermite(
        feats, ts, jnp.asarray(1.5), order=1, clip_target=False
    )
    np.testing.assert_allclose(pred, (3 * 1.5 - 1) * jnp.ones((2,)), rtol=1e-3)
    # Traced clip condition also works (hist_len <= order fallback form).
    pred_clipped = predict_hermite(
        feats, ts, jnp.asarray(1.5), order=1, clip_target=jnp.asarray(True)
    )
    np.testing.assert_allclose(pred_clipped, 2.0 * jnp.ones((2,)), rtol=1e-3)
