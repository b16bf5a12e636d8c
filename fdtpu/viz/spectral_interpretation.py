"""Dataset-level spectral figures
(reference `/root/reference/src/fdiff/visualization/spectral_interpretation.py`):
spectral density curves, temporal energy distribution, and time/frequency
(joint) delocalization plots per dataset (reference :34-401).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from fdtpu.ops import localization_metrics, spectral_density


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_spectral_density(
    x: np.ndarray,
    label: str = "dataset",
    other: Optional[np.ndarray] = None,
    other_label: str = "generated",
    channel: int = 0,
    log_scale: bool = True,
    save_path: Optional[Path] = None,
):
    """Mean per-frequency energy, optionally comparing two sample sets."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))

    def curve(data, lbl):
        dens = np.asarray(spectral_density(jnp.asarray(data, jnp.float32)))
        mean = dens[:, :, channel].mean(axis=0)
        ax.plot(mean, label=lbl)

    curve(x, label)
    if other is not None:
        curve(other, other_label)
    if log_scale:
        ax.set_yscale("log")
    ax.set_xlabel("frequency bin")
    ax.set_ylabel("spectral density")
    ax.legend()
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150)
        plt.close(fig)
    return fig


def plot_temporal_energy(
    x: np.ndarray,
    label: str = "dataset",
    channel: int = 0,
    save_path: Optional[Path] = None,
):
    """Mean energy per time step (reference temporal-energy figures)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    energy = (x[:, :, channel] ** 2).mean(axis=0)
    ax.plot(energy, label=label)
    ax.set_xlabel("time step")
    ax.set_ylabel("mean energy")
    ax.legend()
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150)
        plt.close(fig)
    return fig


def plot_delocalization(
    datasets: dict[str, np.ndarray],
    save_path: Optional[Path] = None,
):
    """Joint time/frequency delocalization scatter per dataset
    (reference spectral_interpretation.py joint figures)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 5))
    for name, x in datasets.items():
        t_loc, f_loc = localization_metrics(jnp.asarray(x, jnp.float32))
        ax.scatter(np.asarray(t_loc), np.asarray(f_loc), s=8, alpha=0.5, label=name)
    ax.set_xlabel("time delocalization")
    ax.set_ylabel("frequency delocalization")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150)
        plt.close(fig)
    return fig
