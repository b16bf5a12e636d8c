"""FreSca frequency-selective score scaling (arXiv:2504.02154), jit-safe.

TPU-native redesign of the reference `/root/reference/src/fdiff/utils/fresca.py`:
the energy-based cutoff search (reference fresca.py:52-59, a Python loop over
frequencies) becomes a `cumsum` + comparison, so the whole operation traces into
the compiled sampling loop with static shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def create_frequency_masks(
    n_freq: int,
    cutoff_ratio: float,
    cutoff_strategy: str = "spatial",
    freq_spectrum: Optional[Array] = None,
) -> tuple[Array, Array]:
    """Low-pass / high-pass masks over ``n_freq`` 1-D frequency bins.

    ``spatial``: cutoff at ``r0 * n_freq``.  ``energy``: smallest index whose
    cumulative ``|spectrum|`` reaches ``r0`` of the total (reference
    fresca.py:44-60, loop replaced by cumsum).

    Returns float masks ``(low, high)`` of shape ``(n_freq,)``.
    """
    k = jnp.arange(n_freq, dtype=jnp.float32)
    if cutoff_strategy == "spatial":
        rc = cutoff_ratio * n_freq
        low = (k <= rc).astype(jnp.float32)
    elif cutoff_strategy == "energy":
        if freq_spectrum is None:
            raise ValueError("freq_spectrum required for energy-based cutoff")
        mag = jnp.abs(freq_spectrum)
        cum = jnp.cumsum(mag)
        total = cum[-1]
        reached = cum >= cutoff_ratio * total
        # First index where the cumulative energy reaches the target.
        rc = jnp.argmax(reached).astype(jnp.float32)
        # Reference semantics: if never reached (degenerate), Rc stays 0.
        rc = jnp.where(jnp.any(reached), rc, 0.0)
        low = (k <= rc).astype(jnp.float32)
    else:
        raise ValueError(f"Unknown cutoff_strategy: {cutoff_strategy}")
    return low, 1.0 - low


def create_frequency_masks_2d(
    shape: tuple[int, int],
    cutoff_ratio: float,
    cutoff_strategy: str = "spatial",
    freq_spectrum: Optional[Array] = None,
) -> tuple[Array, Array]:
    """Radial low/high masks over a 2-D ``(H, n_freq_w)`` spectrum.

    Reference fresca.py:66-104: distance from DC is ``√(kx²+ky²)`` with
    UNFOLDED row index (rows past H/2 count as high frequency — reference
    behavior kept).  ``spatial``: cutoff at ``r0·min(H/2, W/2)``.
    ``energy``: the smallest integer radius whose enclosed ``|spectrum|``
    reaches ``r0`` of the total, searched over R ∈ [0, min(H,W)/2]
    (reference's Python loop over radii becomes one segment-sum over
    ceil-radius bins + cumsum — jit/scan-safe, no data-dependent shapes).
    """
    h, n_freq_w = shape
    kx = jnp.arange(h, dtype=jnp.float32)[:, None]
    ky = jnp.arange(n_freq_w, dtype=jnp.float32)[None, :]
    k_dist = jnp.sqrt(kx**2 + ky**2)  # (H, n_freq_w)
    if cutoff_strategy == "spatial":
        rc = cutoff_ratio * min(h / 2, n_freq_w)
        low = (k_dist <= rc).astype(jnp.float32)
    elif cutoff_strategy == "energy":
        if freq_spectrum is None:
            raise ValueError("freq_spectrum required for energy-based cutoff")
        mag = jnp.abs(freq_spectrum)
        # A pixel at distance d is first enclosed by the integer radius
        # ceil(d): bucket energies by ceil-radius, cumsum = enclosed energy
        # per candidate R.
        r_max = int(min(h, 2 * (n_freq_w - 1)) / 2)
        n_bins = int(math.ceil(math.hypot(h - 1, n_freq_w - 1))) + 1
        bins = jnp.ceil(k_dist).astype(jnp.int32).reshape(-1)
        per_radius = jax.ops.segment_sum(
            mag.reshape(-1), bins, num_segments=n_bins
        )
        enclosed = jnp.cumsum(per_radius)
        total = enclosed[-1]
        candidates = enclosed[: r_max + 1]
        reached = candidates >= cutoff_ratio * total
        rc = jnp.where(
            jnp.any(reached), jnp.argmax(reached), 0
        ).astype(jnp.float32)
        low = (k_dist <= rc).astype(jnp.float32)
    else:
        raise ValueError(f"Unknown cutoff_strategy: {cutoff_strategy}")
    return low, 1.0 - low


def _dft_mats(n: int) -> tuple[Array, Array]:
    """Orthonormal DFT cos/sin matrices: F = (C − iS), C[j,k]=cos(2πjk/n)/√n."""
    jk = jnp.outer(jnp.arange(n), jnp.arange(n)) * (2.0 * math.pi / n)
    return jnp.cos(jk) / math.sqrt(n), jnp.sin(jk) / math.sqrt(n)


def _frequency_scale_2d_matmul(
    x: Array, scale_2d: Array
) -> Array:
    """``irfft2(scale ⊙ rfft2(x))`` with NO FFT op: complex DFTs as real
    cos/sin MXU matmuls (the axon TPU backend has no FFT — same constraint
    as :mod:`fdtpu.ops.fourier`'s packed matmul path, here in full complex
    form because the radial mask is not separable).

    ``x``: (B, H, W, C) real.  ``scale_2d``: (H, W//2+1) real per-bin scale.
    Mirrors ``jnp.fft.irfft2(scale * jnp.fft.rfft2(x, axes=(1,2)),
    axes=(1,2))`` exactly (ortho norm), including the Hermitian completion
    the half-spectrum representation implies.
    """
    b, h, w, c = x.shape
    n_freq_w = w // 2 + 1
    ch, sh = _dft_mats(h)
    cw, sw = _dft_mats(w)

    # fft along H (real input): z = F_H x → re = C x, im = −S x.
    re = jnp.einsum("jh,bhwc->bjwc", ch, x)
    im = -jnp.einsum("jh,bhwc->bjwc", sh, x)
    # rfft along W of complex z: truncate F_W to the first W//2+1 rows.
    cwt, swt = cw[:n_freq_w], sw[:n_freq_w]
    re2 = (
        jnp.einsum("vw,bhwc->bhvc", cwt, re)
        + jnp.einsum("vw,bhwc->bhvc", swt, im)
    )
    im2 = (
        jnp.einsum("vw,bhwc->bhvc", cwt, im)
        - jnp.einsum("vw,bhwc->bhvc", swt, re)
    )

    s = scale_2d[None, :, :, None]
    re2, im2 = re2 * s, im2 * s

    # ifft along H: conj(F_H) = C + iS.
    re3 = jnp.einsum("hj,bjvc->bhvc", ch.T, re2) - jnp.einsum(
        "hj,bjvc->bhvc", sh.T, im2
    )
    im3 = jnp.einsum("hj,bjvc->bhvc", sh.T, re2) + jnp.einsum(
        "hj,bjvc->bhvc", ch.T, im2
    )

    # irfft along W (Hermitian completion): pairing bin v with W−v gives
    # out[n] = Σ_v c_v (re_v cos(2πvn/W) − im_v sin(2πvn/W)) / √W with
    # c_0 = c_{W/2} = 1 (W even), 2 otherwise.
    coeff = jnp.full((n_freq_w,), 2.0)
    coeff = coeff.at[0].set(1.0)
    if w % 2 == 0:
        coeff = coeff.at[-1].set(1.0)
    a = coeff[:, None] * cwt  # (n_freq_w, W): cos(2πvn/W)/√W scaled
    bm = -coeff[:, None] * swt
    return jnp.einsum("vn,bhvc->bhnc", a, re3) + jnp.einsum(
        "vn,bhvc->bhnc", bm, im3
    )


def _frequency_scale_2d(
    x: Array,
    low_scale: float | Array,
    high_scale: float | Array,
    cutoff_ratio: float,
    cutoff_strategy: str,
    impl: str,
) -> Array:
    """4-D (B, H, W, C) branch of :func:`frequency_scale` (reference
    fresca.py:185-216): radial 2-D masks over the rfft2 spectrum."""
    from fdtpu.ops.fourier import _resolve_impl

    _, h, w, _ = x.shape
    n_freq_w = w // 2 + 1
    use_matmul = _resolve_impl(impl) == "matmul"

    xf = None if use_matmul else jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")
    if cutoff_strategy == "energy":
        if use_matmul:
            # Spectrum magnitudes for the energy cutoff, via the same
            # matmul transform (forward only).
            ch, sh = _dft_mats(h)
            cw, sw = _dft_mats(w)
            cwt, swt = cw[:n_freq_w], sw[:n_freq_w]
            re = jnp.einsum("jh,bhwc->bjwc", ch, x)
            im = -jnp.einsum("jh,bhwc->bjwc", sh, x)
            re2 = jnp.einsum("vw,bhwc->bhvc", cwt, re) + jnp.einsum(
                "vw,bhwc->bhvc", swt, im
            )
            im2 = jnp.einsum("vw,bhwc->bhvc", cwt, im) - jnp.einsum(
                "vw,bhwc->bhvc", swt, re
            )
            mag = jnp.sqrt(re2**2 + im2**2).mean(axis=(0, 3))  # (H, n_freq_w)
        else:
            mag = jnp.abs(xf).mean(axis=(0, 3))
        low, high = create_frequency_masks_2d(
            (h, n_freq_w), cutoff_ratio, "energy", mag
        )
    else:
        low, high = create_frequency_masks_2d(
            (h, n_freq_w), cutoff_ratio, "spatial"
        )
    scale_2d = low_scale * low + high_scale * high

    if use_matmul:
        return _frequency_scale_2d_matmul(x, scale_2d)
    return jnp.fft.irfft2(
        xf * scale_2d[None, :, :, None], s=(h, w), axes=(1, 2), norm="ortho"
    )


def frequency_scale(
    x: Array,
    low_scale: float | Array = 1.0,
    high_scale: float | Array = 1.0,
    cutoff_ratio: float = 0.5,
    cutoff_strategy: str = "spatial",
    impl: str = "auto",
) -> Array:
    """Scale low/high frequency bands of ``x`` independently.

    ``x``: ``(batch, seq_len, channels)`` — FFT along the sequence axis
    (reference ``frequency_scale`` 3-D branch, fresca.py:111-183) — or
    ``(batch, H, W, channels)`` — 2-D spatial spectrum with radial masks
    (reference 4-D branch, fresca.py:185-216).

    On accelerators the scaling runs in matmul-DFT form (the axon TPU
    runtime has no FFT op): the 1-D path uses the packed real-DFT
    representation (two MXU matmuls + a per-bin scale); the 2-D path runs
    the complex DFT as cos/sin matmuls (the radial mask is not separable).
    """
    if x.ndim == 4:
        return _frequency_scale_2d(
            x, low_scale, high_scale, cutoff_ratio, cutoff_strategy, impl
        )
    from fdtpu.ops.fourier import (
        _resolve_impl,
        dft,
        idft,
        n_real_components,
        packed_freq_index,
    )

    seq_len = x.shape[1]
    n_freq = seq_len // 2 + 1

    if _resolve_impl(impl) == "matmul":
        packed = dft(x, impl="matmul")
        bin_idx = packed_freq_index(seq_len)
        if cutoff_strategy == "energy":
            n_real = n_real_components(seq_len)
            re = packed[:, :n_real, :]
            n_im = seq_len - n_real
            im = jnp.zeros_like(re).at[:, 1 : 1 + n_im, :].set(packed[:, n_real:, :])
            spectrum = jnp.sqrt(re**2 + im**2).mean(axis=(0, 2))  # (n_freq,)
            low, high = create_frequency_masks(n_freq, cutoff_ratio, "energy", spectrum)
        else:
            low, high = create_frequency_masks(n_freq, cutoff_ratio, "spatial")
        scale_bins = low_scale * low + high_scale * high  # (n_freq,)
        scale_packed = scale_bins[bin_idx]
        return idft(packed * scale_packed[None, :, None], impl="matmul")

    xf = jnp.fft.rfft(x, axis=1, norm="ortho")
    if cutoff_strategy == "energy":
        spectrum = jnp.abs(xf).mean(axis=(0, 2))
        low, high = create_frequency_masks(n_freq, cutoff_ratio, "energy", spectrum)
    else:
        low, high = create_frequency_masks(n_freq, cutoff_ratio, "spatial")
    low = low[None, :, None]
    high = high[None, :, None]
    xf_scaled = low_scale * low * xf + high_scale * high * xf
    return jnp.fft.irfft(xf_scaled, n=seq_len, axis=1, norm="ortho")


def apply_fresca_to_score(
    score: Array,
    low_scale: float = 1.0,
    high_scale: float = 1.0,
    cutoff_ratio: float = 0.5,
    cutoff_strategy: str = "energy",
    timestep: Optional[Array] = None,
    num_steps: Optional[int] = None,
) -> Array:
    """FreSca on a score prediction, with optional linear high-scale decay.

    Parity: reference ``apply_fresca_to_score`` (fresca.py:220-268) including
    the time-dependent schedule h(t) = (1 − t/T)·(h − 1) + 1 for h > 1.
    Implemented branch-free so it traces inside `lax.scan`.
    """
    high = jnp.asarray(high_scale, dtype=score.dtype)
    if timestep is not None and num_steps is not None and num_steps > 0:
        t_norm = jnp.asarray(timestep, dtype=score.dtype) / num_steps
        decayed = (1.0 - t_norm) * (high - 1.0) + 1.0
        high = jnp.where(high > 1.0, decayed, high)
    return frequency_scale(
        score,
        low_scale=low_scale,
        high_scale=high,
        cutoff_ratio=cutoff_ratio,
        cutoff_strategy=cutoff_strategy,
    )


def analyze_frequency_content(
    x: Array, cutoff_ratio: float = 0.5, impl: str = "auto"
) -> dict[str, Array]:
    """Low/high band energy split of ``x`` (reference fresca.py:271-309)."""
    from fdtpu.ops.fourier import _resolve_impl, dft, n_real_components

    seq_len = x.shape[1]
    n_freq = seq_len // 2 + 1
    if _resolve_impl(impl) == "matmul":
        packed = dft(x, impl="matmul")
        n_real = n_real_components(seq_len)
        re = packed[:, :n_real, :]
        n_im = seq_len - n_real
        im = jnp.zeros_like(re).at[:, 1 : 1 + n_im, :].set(packed[:, n_real:, :])
        mag = jnp.sqrt(re**2 + im**2)
    else:
        mag = jnp.abs(jnp.fft.rfft(x, axis=1, norm="ortho"))
    low, high = create_frequency_masks(n_freq, cutoff_ratio, "spatial")
    low_energy = (mag * low[None, :, None]).sum()
    high_energy = (mag * high[None, :, None]).sum()
    total = mag.sum()
    return {
        "low_energy": low_energy,
        "high_energy": high_energy,
        "total_energy": total,
        "low_energy_ratio": low_energy / (total + 1e-8),
        "high_energy_ratio": high_energy / (total + 1e-8),
    }
