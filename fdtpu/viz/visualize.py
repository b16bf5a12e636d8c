"""Sample visualization (reference `/root/reference/src/fdiff/visualization/visualize.py`).

Line plots and heatmaps of generated samples next to training data, loaded
from a run directory's ``samples.npy`` (reference loads ``samples.pt``,
visualize.py:80-206, 260-346).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_sample_lines(
    samples: np.ndarray,
    reference: Optional[np.ndarray] = None,
    n_examples: int = 8,
    channel: int = 0,
    title: str = "Generated samples",
    save_path: Optional[Path] = None,
):
    """Overlay line plots of generated (and optionally real) series."""
    plt = _plt()
    fig, axes = plt.subplots(
        1, 2 if reference is not None else 1, figsize=(11, 3.5), squeeze=False
    )
    ax = axes[0, 0]
    for i in range(min(n_examples, len(samples))):
        ax.plot(samples[i, :, channel], alpha=0.7, lw=1)
    ax.set_title(title)
    ax.set_xlabel("time step")
    if reference is not None:
        ax2 = axes[0, 1]
        for i in range(min(n_examples, len(reference))):
            ax2.plot(reference[i, :, channel], alpha=0.7, lw=1)
        ax2.set_title("Training data")
        ax2.set_xlabel("time step")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150)
        plt.close(fig)
    return fig


def plot_sample_heatmap(
    samples: np.ndarray,
    n_examples: int = 64,
    channel: int = 0,
    title: str = "Generated samples",
    save_path: Optional[Path] = None,
):
    """Heatmap of many samples stacked on the vertical axis
    (reference visualize.py:260-346)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    data = samples[:n_examples, :, channel]
    im = ax.imshow(data, aspect="auto", cmap="viridis", interpolation="nearest")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    ax.set_xlabel("time step")
    ax.set_ylabel("sample")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150)
        plt.close(fig)
    return fig


def visualize_samples(
    run_dir: Path | str,
    reference: Optional[np.ndarray] = None,
    out_dir: Optional[Path] = None,
) -> list[Path]:
    """Produce the standard figure set for a run's ``samples.npy``."""
    run_dir = Path(run_dir)
    samples = np.load(run_dir / "samples.npy")
    out_dir = Path(out_dir) if out_dir is not None else run_dir / "figures"
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    p = out_dir / "samples_lines.png"
    plot_sample_lines(samples, reference=reference, save_path=p)
    paths.append(p)
    p = out_dir / "samples_heatmap.png"
    plot_sample_heatmap(samples, save_path=p)
    paths.append(p)
    return paths
