"""Orthonormal real-DFT repacking and spectral utilities (pure jnp, jit-safe).

TPU-native re-design of the reference spectral layer
(`/root/reference/src/fdiff/utils/fourier.py:8-497`).  All functions are pure,
shape-static, and differentiable-free by convention (the frequency transform is
data preprocessing, applied outside the training graph — reference detaches at
fourier.py:52,94).  They can be jitted standalone or traced inside larger
programs; XLA lowers the FFTs onto the TPU FFT path and fuses the packing
reshuffles.

Packing convention (same as reference): a real series of length ``T`` maps to
``[Re(0..Nyq) ‖ Im(1..Nyq-1)]`` along the time axis, giving a *real* tensor of
identical shape ``(B, T, C)``.  DC (and Nyquist for even ``T``) imaginary parts
are identically zero for real input and are dropped rather than stored.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def n_real_components(max_len: int) -> int:
    """Number of non-redundant real (cosine) components: ceil((T+1)/2) = T//2 + 1."""
    return max_len // 2 + 1


# --------------------------------------------------------------------------
# Matmul-DFT path.
#
# The packed orthonormal real DFT is a *linear* map, so for the short series
# this framework targets (max_len ≤ 512) it is one (T, T) matmul — which runs
# on the MXU, fuses with neighboring ops, and needs no FFT custom-call (the
# axon TPU runtime does not implement XLA's FFT op at all).  `impl="auto"`
# picks the matmul on accelerators and jnp.fft on CPU hosts.
# --------------------------------------------------------------------------

_IMPL_OVERRIDE: str | None = None


def set_dft_impl(impl: str | None) -> None:
    """Globally override the DFT implementation ("fft" | "matmul" | None=auto)."""
    global _IMPL_OVERRIDE
    _IMPL_OVERRIDE = impl


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    return "fft" if jax.default_backend() == "cpu" else "matmul"


def packed_freq_index(max_len: int) -> Array:
    """rfft bin index of each packed component: [0..Nyq, 1..] (length T)."""
    n_real = n_real_components(max_len)
    return jnp.concatenate(
        [jnp.arange(n_real), jnp.arange(1, max_len - n_real + 1)]
    )


def packed_dft_matrix(max_len: int, dtype=jnp.float32) -> Array:
    """(T, T) matrix F with ``dft(x) = einsum('btc,tf->bfc', x, F)``.

    Columns 0..Nyq are cos(2πkt/T)/√T (the orthonormal rfft real parts);
    the remaining columns are −sin(2πkt/T)/√T for k = 1..(T−n_real)
    (the imaginary parts, e^{−2πikt/T} convention).
    """
    n_real = n_real_components(max_len)
    # Reduce t·k mod T in integer space before the trig call: keeps the
    # argument in [0, 2π) so float32 cos/sin stay accurate on TPU.
    t = jnp.arange(max_len, dtype=jnp.int32)[:, None]
    k_re = jnp.arange(n_real, dtype=jnp.int32)[None, :]
    k_im = jnp.arange(1, max_len - n_real + 1, dtype=jnp.int32)[None, :]
    scale = 1.0 / math.sqrt(max_len)
    ang_re = ((t * k_re) % max_len).astype(jnp.float32) * (2 * math.pi / max_len)
    ang_im = ((t * k_im) % max_len).astype(jnp.float32) * (2 * math.pi / max_len)
    cos_part = jnp.cos(ang_re) * scale
    sin_part = -jnp.sin(ang_im) * scale
    return jnp.concatenate([cos_part, sin_part], axis=1).astype(dtype)


def _packed_duplicity(max_len: int) -> Array:
    """d_j = 1 for DC (and Nyquist when even), 1/2 for interior components.

    F^T F = diag(d), so F^{-1} = diag(1/d) F^T.
    """
    k = packed_freq_index(max_len)
    is_boundary = (k == 0) | ((max_len % 2 == 0) & (k == max_len // 2))
    return jnp.where(is_boundary, 1.0, 0.5)


def packed_idft_matrix(max_len: int, dtype=jnp.float32) -> Array:
    """(T, T) matrix F⁻¹ with ``idft(x) = einsum('bfc,ft->btc', x, F_inv)``."""
    f = packed_dft_matrix(max_len, jnp.float64)
    inv_d = 1.0 / _packed_duplicity(max_len)
    return (f * inv_d[None, :]).T.astype(dtype)


def dft(x: Array, impl: str = "auto") -> Array:
    """Orthonormal real DFT packed into a real tensor of the same shape.

    Args:
        x: Real time series ``(batch, max_len, n_channels)``.

    Returns:
        ``(batch, max_len, n_channels)`` tensor ``[Re(0..Nyq) ‖ Im(1..Nyq-1)]``.

    Parity: reference ``dft`` (fourier.py:8-52).  The reference zeroes tiny
    numerical imaginary parts at DC/Nyquist before dropping them; here they are
    simply dropped (identical result for real input).
    """
    if jnp.iscomplexobj(x):
        x = jnp.real(x)
    max_len = x.shape[1]
    if _resolve_impl(impl) == "matmul":
        f = packed_dft_matrix(max_len, x.dtype)
        return jnp.einsum(
            "btc,tf->bfc", x, f, precision=jax.lax.Precision.HIGHEST
        )
    xf = jnp.fft.rfft(x, axis=1, norm="ortho")
    re = jnp.real(xf)
    im = jnp.imag(xf)[:, 1:, :]
    if max_len % 2 == 0:
        im = im[:, :-1, :]
    x_tilde = jnp.concatenate([re, im], axis=1)
    assert x_tilde.shape == x.shape
    return x_tilde


def idft(x: Array, impl: str = "auto") -> Array:
    """Inverse of :func:`dft` (reference fourier.py:55-94)."""
    max_len = x.shape[1]
    if _resolve_impl(impl) == "matmul":
        f_inv = packed_idft_matrix(max_len, x.dtype)
        return jnp.einsum(
            "bfc,ft->btc", x, f_inv, precision=jax.lax.Precision.HIGHEST
        )
    n_real = math.ceil((max_len + 1) / 2)
    x_re = x[:, :n_real, :]
    x_im = x[:, n_real:, :]
    zero = jnp.zeros_like(x[:, :1, :])
    x_im = jnp.concatenate([zero, x_im], axis=1)
    if max_len % 2 == 0:
        x_im = jnp.concatenate([x_im, zero], axis=1)
    x_freq = jax.lax.complex(x_re, x_im)
    x_time = jnp.fft.irfft(x_freq, n=max_len, axis=1, norm="ortho")
    assert x_time.shape == x.shape
    return x_time


def spectral_density(x: Array, apply_dft: bool = True) -> Array:
    """Per-frequency energy ``Re² + Im²`` (reference fourier.py:97-131).

    Returns ``(batch, n_frequencies, n_channels)`` with
    ``n_frequencies = max_len // 2 + 1``.
    """
    max_len = x.shape[1]
    x = dft(x) if apply_dft else x
    n_real = math.ceil((max_len + 1) / 2)
    x_re = x[:, :n_real, :]
    x_im = x[:, n_real:, :]
    zero = jnp.zeros_like(x[:, :1, :])
    x_im = jnp.concatenate([zero, x_im], axis=1)
    if max_len % 2 == 0:
        x_im = jnp.concatenate([x_im, zero], axis=1)
    return x_re**2 + x_im**2


def localization_metrics(x: Array) -> tuple[Array, Array]:
    """Cyclic-distance delocalization in time and frequency per sample.

    Parity: reference ``localization_metrics`` (fourier.py:134-182).

    Returns:
        ``(time_delocalization, freq_delocalization)``, each ``(batch,)``.
    """
    max_len = x.shape[1]

    # Energy distribution over time.
    x_energy = jnp.sum(x**2, axis=2) / jnp.sum(x**2, axis=(1, 2), keepdims=True)[..., 0]

    # Energy distribution over frequency (mirrored beyond Nyquist).
    x_spec = spectral_density(x)
    if max_len % 2 != 0:
        mirror = jnp.flip(x_spec[:, 1:, :], axis=1)
    else:
        mirror = jnp.flip(x_spec[:, 1:-1, :], axis=1)
    x_spec = jnp.concatenate([x_spec, mirror], axis=1)
    x_spec = jnp.sum(x_spec, axis=2) / jnp.sum(x_spec, axis=(1, 2), keepdims=True)[..., 0]
    assert x_spec.shape[1] == max_len

    # Cyclic distance between positions.
    t = jnp.arange(max_len, dtype=x.dtype)
    diff = jnp.abs(t[:, None] - t[None, :])
    cyclic = jnp.minimum(diff, max_len - diff)
    cyc2 = cyclic**2

    x_loc = jnp.min(jnp.einsum("bt,ts->bs", x_energy, cyc2), axis=1)
    x_spec_loc = jnp.min(jnp.einsum("bt,ts->bs", x_spec, cyc2), axis=1)
    return x_loc, x_spec_loc


def smooth_frequency(x: Array, sigma: float) -> Array:
    """Gaussian smoothing in the packed frequency domain (fourier.py:185-216).

    Builds a column-normalized Gaussian kernel over the paired frequency index
    ``k = [0..Nyq) ∪ [1..Nyq)`` and convolves the packed spectrum with it.
    """
    max_len = x.shape[1]
    # Frequency index of each packed component: Re(0..Nyq) then Im(1..).
    # Matches the reference construction for odd lengths (fourier.py:196-206)
    # and generalizes it correctly to even lengths (where the reference's
    # float-arange misses the Nyquist row).
    n_real = n_real_components(max_len)
    k = jnp.concatenate(
        [
            jnp.arange(0, n_real, dtype=jnp.float32),
            jnp.arange(1, max_len - n_real + 1, dtype=jnp.float32),
        ]
    )
    kernel = jnp.exp(-(((k[:, None] - k[None, :]) / sigma) ** 2) / 2)
    kernel = kernel / jnp.sum(kernel, axis=0, keepdims=True)
    x_tilde = dft(x)
    x_tilde = jnp.einsum("btc,ts->bsc", x_tilde, kernel)
    return idft(x_tilde)


@partial(jax.jit, static_argnames=("low_freq_ratio", "impl"))
def frequency_decompose_fft(
    x: Array, low_freq_ratio: float = 0.3, impl: str = "auto"
) -> tuple[Array, Array]:
    """Split features into low/high-frequency parts at ``low_freq_ratio``.

    FreqCa-style decomposition (reference fourier.py:219-286) along the
    sequence axis.  Accepts ``(B, L, D)`` or ``(L, D)``.  The split is a
    linear projection, so the accelerator path is two packed-DFT matmuls
    (no FFT custom-call).
    """
    was_2d = x.ndim == 2
    if was_2d:
        x = x[None]
    seq_len = x.shape[1]
    n_freq = seq_len // 2 + 1
    n_low = max(1, int(n_freq * low_freq_ratio))
    if _resolve_impl(impl) == "matmul":
        packed = dft(x, impl="matmul")
        bin_idx = packed_freq_index(seq_len)[None, :, None]
        low_mask = (bin_idx < n_low).astype(x.dtype)
        x_low = idft(packed * low_mask, impl="matmul")
        x_high = x - x_low
    else:
        xf = jnp.fft.rfft(x, axis=1, norm="ortho")
        idx = jnp.arange(n_freq)[None, :, None]
        low_mask = (idx < n_low).astype(xf.dtype)
        x_low = jnp.fft.irfft(xf * low_mask, n=seq_len, axis=1, norm="ortho")
        x_high = jnp.fft.irfft(xf * (1 - low_mask), n=seq_len, axis=1, norm="ortho")
    if was_2d:
        x_low, x_high = x_low[0], x_high[0]
    return x_low, x_high


def frequency_decompose_dct(
    x: Array, low_freq_ratio: float = 0.3
) -> tuple[Array, Array]:
    """DCT variant; delegates to the FFT decomposition like the reference
    (fourier.py:289-305 — its DCT body is unreachable dead code)."""
    return frequency_decompose_fft(x, low_freq_ratio)


def hermite_polynomials(s: Array, order: int = 2) -> Array:
    """Physicists' Hermite polynomials H_0..H_order evaluated at ``s``.

    Args:
        s: ``(K,)`` or ``(batch, K)`` values in [-1, 1].
        order: maximum polynomial order (static).

    Returns:
        ``(order+1, K)`` or ``(order+1, batch, K)``.

    Parity: reference fourier.py:341-395 (recurrence H_{n+1} = 2s·H_n − 2n·H_{n−1}).
    """
    was_1d = s.ndim == 1
    if was_1d:
        s = s[None]
    rows = [jnp.ones_like(s)]
    if order >= 1:
        rows.append(2 * s)
    for n in range(1, order):
        rows.append(2 * s * rows[n] - 2 * n * rows[n - 1])
    h = jnp.stack(rows, axis=0)
    if was_1d:
        h = h[:, 0, :]
    return h


def hermite_design_matrix(s: Array, order: int) -> Array:
    """Design matrix ``(K, order+1)`` of Hermite polynomials at points ``s (K,)``."""
    return hermite_polynomials(s, order=order).T


def predict_hermite(
    history: Array,
    timesteps: Array,
    target_timestep: Array,
    order: int = 2,
    valid: Optional[Array] = None,
    clip_target: bool | Array = True,
) -> Array:
    """Least-squares Hermite extrapolation of feature history (FreqCa).

    TPU-native redesign of reference fourier.py:398-497: the history is a
    stacked array (static length ``K``) instead of a Python list, so the
    whole prediction is one batched lstsq solvable inside jit/scan.

    Args:
        history: ``(K, ...)`` stacked feature history (oldest first).
        timesteps: ``(K,)`` timesteps of the history entries.
        target_timestep: scalar target time.
        order: Hermite order (static).
        valid: optional ``(K,)`` bool mask of live ring entries.  A
            fixed-size ring that is not yet full carries zero-padded rows;
            without the mask those rows enter the fit as real observations
            at t=0 and corrupt the coefficients (the reference's Python
            list has no such rows).  Implemented as zero-weight rows in the
            normal equations.
        clip_target: clip the normalized target into the history span
            (reference behavior — smoothing, the prediction saturates at
            the span edge).  ``False`` evaluates the fitted polynomial at
            the true (extrapolated) target, for genuinely predictive use.
            May be a traced bool — e.g. ``hist_len <= order`` so an
            underdetermined fit (fewer live points than coefficients, held
            together only by the ridge term) is never extrapolated.

    Returns:
        Predicted features with shape ``history.shape[1:]``.
    """
    k = history.shape[0]
    if k < 2:
        return history[-1]
    if valid is None:
        valid = jnp.ones((k,), bool)
    w = valid.astype(history.dtype)
    big = jnp.finfo(timesteps.dtype).max
    t_min = jnp.min(jnp.where(valid, timesteps, big))
    t_max = jnp.max(jnp.where(valid, timesteps, -big))
    span = t_max - t_min
    safe_span = jnp.where(span == 0, 1.0, span)
    s_hist = jnp.clip(2 * (timesteps - t_min) / safe_span - 1, -1.0, 1.0)
    s_target = 2 * (target_timestep - t_min) / safe_span - 1
    s_target = jnp.where(clip_target, jnp.clip(s_target, -1.0, 1.0), s_target)

    h_matrix = hermite_design_matrix(s_hist, order) * w[:, None]  # (K, order+1)
    h_target = hermite_polynomials(s_target[None], order=order)[:, 0]  # (order+1,)

    hth = h_matrix.T @ h_matrix + jnp.eye(order + 1, dtype=history.dtype) * 1e-6
    flat = history.reshape(k, -1) * w[:, None]
    coeffs = jnp.linalg.solve(hth, h_matrix.T @ flat)  # (order+1, F)
    prediction = (h_target @ coeffs).reshape(history.shape[1:])
    # Degenerate span: fall back to the most recent entry (reference behavior).
    return jnp.where(
        span == 0, history[-1], prediction
    )
