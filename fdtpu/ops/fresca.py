"""FreSca frequency-selective score scaling (arXiv:2504.02154), jit-safe.

TPU-native redesign of the reference `/root/reference/src/fdiff/utils/fresca.py`:
the energy-based cutoff search (reference fresca.py:52-59, a Python loop over
frequencies) becomes a `cumsum` + comparison, so the whole operation traces into
the compiled sampling loop with static shapes.
"""

from __future__ import annotations

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


def frequency_scale(
    x: Array,
    low_scale: float | Array = 1.0,
    high_scale: float | Array = 1.0,
    cutoff_ratio: float = 0.5,
    cutoff_strategy: str = "spatial",
    impl: str = "auto",
) -> Array:
    """Scale low/high frequency bands of ``x`` independently.

    ``x``: ``(batch, seq_len, channels)``; FFT along the sequence axis.
    Parity: reference ``frequency_scale`` (fresca.py:111-183, 3-D branch; the
    reference 4-D image branch is out of scope for time series).

    On accelerators the scaling runs in the packed real-DFT representation
    (two MXU matmuls + an elementwise per-bin scale) — the axon TPU runtime
    has no FFT op, and for max_len ≤ 512 the matmul is faster anyway.
    """
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
