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


# --------------------------------------------------------------------------
# Dataset batch processing (reference spectral_interpretation.py:34-209):
# per-dataset tidy DataFrames of normalized spectral density, temporal
# energy, and (joint) delocalization, over a registry of datamodules.
# --------------------------------------------------------------------------
_EPS = 1e-12


def process_dataset(dataset_name: str, datamodule):
    """prepare_data → setup → tidy (spectral, temporal, localization,
    localization_joint) frames for one datamodule
    (reference spectral_interpretation.py:34-148)."""
    import pandas as pd

    datamodule.prepare_data()
    datamodule.setup()
    x = np.asarray(datamodule.X_train, dtype=np.float32)

    spec = np.asarray(spectral_density(jnp.asarray(x)))  # (N, F, C)
    share = spec.sum(axis=2, keepdims=True) / (
        _EPS + spec.sum(axis=(1, 2), keepdims=True)
    )
    spec_mean = share.mean(axis=(0, 2))
    spec_se = share.std(axis=(0, 2)) / np.sqrt(len(spec))
    freq_norm = np.arange(spec.shape[1]) / max(1, spec.shape[1] - 1)
    spectral_df = pd.DataFrame(
        {
            "Dataset": dataset_name,
            "Normalized Frequency": freq_norm,
            "Normalized Spectral Density": spec_mean,
            "SE": spec_se,
        }
    )

    energy = (x**2).sum(axis=2, keepdims=True) / (
        _EPS + (x**2).sum(axis=(1, 2), keepdims=True)
    )
    time_norm = np.arange(x.shape[1]) / max(1, x.shape[1] - 1)
    temporal_df = pd.DataFrame(
        {
            "Dataset": dataset_name,
            "Normalized Time": time_norm,
            "Normalized Energy": energy.mean(axis=(0, 2)),
            "SE": energy.std(axis=(0, 2)),
        }
    )

    t_loc, f_loc = localization_metrics(jnp.asarray(x))
    t_loc, f_loc = np.asarray(t_loc), np.asarray(f_loc)
    localization_df = pd.concat(
        [
            pd.DataFrame(
                {"Dataset": dataset_name, "Delocalization": t_loc, "Domain": "Time"}
            ),
            pd.DataFrame(
                {
                    "Dataset": dataset_name,
                    "Delocalization": f_loc,
                    "Domain": "Frequency",
                }
            ),
        ],
        ignore_index=True,
    )
    localization_joint_df = pd.DataFrame(
        {
            "Dataset": dataset_name,
            "Delocalization Time": t_loc,
            "Delocalization Frequency": f_loc,
        }
    )
    return spectral_df, temporal_df, localization_df, localization_joint_df


def default_dataset_registry(data_path: Path | str) -> dict:
    """The reference's six-dataset registry
    (reference spectral_interpretation.py:164-176)."""
    from fdtpu.data import (
        ECGDatamodule,
        MIMICIIIDatamodule,
        NASADatamodule,
        NASDAQDatamodule,
        USDroughtsDatamodule,
    )

    return {
        "ECG": ECGDatamodule(data_dir=data_path),
        "MIMIC-III": MIMICIIIDatamodule(data_dir=data_path, n_feats=40),
        "NASDAQ-2019": NASDAQDatamodule(data_dir=data_path),
        "NASA-Charge": NASADatamodule(data_dir=data_path),
        "NASA-Discharge": NASADatamodule(data_dir=data_path, subdataset="discharge"),
        "US-Droughts": USDroughtsDatamodule(data_dir=data_path),
    }


def process_all_datasets(
    data_path: Path | str,
    output_dir: Optional[Path | str] = None,
    registry: Optional[dict] = None,
):
    """Batch the per-dataset analysis over a registry; skips datasets whose
    raw files are absent (reference spectral_interpretation.py:151-209)."""
    import logging

    import pandas as pd

    registry = registry if registry is not None else default_dataset_registry(data_path)
    frames: list[list] = [[], [], [], []]
    for name, dm in registry.items():
        try:
            results = process_dataset(name, dm)
        except Exception as exc:  # raw files absent, schema drift, …
            logging.warning("Skipping %s: %s", name, exc)
            continue
        for acc, frame in zip(frames, results):
            acc.append(frame)
    if not frames[0]:
        raise ValueError("No datasets could be processed")
    dfs = tuple(pd.concat(acc, ignore_index=True) for acc in frames)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        names = (
            "spectral_density_datasets.csv",
            "temporal_energy_datasets.csv",
            "localization_datasets.csv",
            "localization_joint_datasets.csv",
        )
        for df, fname in zip(dfs, names):
            df.to_csv(output_dir / fname, index=False)
    return dfs


def plot_localization_bars(
    localization_df, save_path: Optional[Path] = None
):
    """Per-dataset time/frequency delocalization bars, log scale
    (reference spectral_interpretation.py:288-318)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    datasets = list(localization_df["Dataset"].unique())
    width = 0.38
    xs = np.arange(len(datasets))
    for off, domain, color in ((-width / 2, "Time", "tab:blue"), (width / 2, "Frequency", "tab:orange")):
        means = [
            localization_df[
                (localization_df["Dataset"] == d)
                & (localization_df["Domain"] == domain)
            ]["Delocalization"].mean()
            for d in datasets
        ]
        ax.bar(xs + off, means, width, label=domain, color=color)
    ax.set_yscale("log")
    ax.set_xticks(xs)
    ax.set_xticklabels(datasets, rotation=45, ha="right", fontsize=7)
    ax.set_ylabel("Delocalization metric")
    ax.legend(title="Domain", fontsize=7)
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig


def plot_localization_joint(
    localization_joint_df, save_path: Optional[Path] = None
):
    """Joint time-vs-frequency delocalization scatter with the identity
    line, log-log (reference spectral_interpretation.py:321-357)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 5))
    for name in localization_joint_df["Dataset"].unique():
        sub = localization_joint_df[localization_joint_df["Dataset"] == name]
        ax.scatter(
            sub["Delocalization Time"],
            sub["Delocalization Frequency"],
            s=8, alpha=0.3, label=name,
        )
    lims = (
        min(
            localization_joint_df["Delocalization Time"].min(),
            localization_joint_df["Delocalization Frequency"].min(),
        ),
        max(
            localization_joint_df["Delocalization Time"].max(),
            localization_joint_df["Delocalization Frequency"].max(),
        ),
    )
    ax.plot(lims, lims, "k:", linewidth=1)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("Delocalization Time")
    ax.set_ylabel("Delocalization Frequency")
    ax.legend(loc="lower right", fontsize=7, title="Dataset")
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig


def spectral_interpretation_main(
    data_path: Path | str,
    output_dir: Path | str,
    registry: Optional[dict] = None,
) -> None:
    """Full dataset-level pipeline: batch analysis → CSVs → the four figure
    families (reference spectral_interpretation.py:359-401)."""
    output_dir = Path(output_dir)
    spectral_df, temporal_df, loc_df, loc_joint_df = process_all_datasets(
        data_path, output_dir, registry=registry
    )
    figures = output_dir / "figures"
    figures.mkdir(parents=True, exist_ok=True)
    plt = _plt()

    fig, ax = plt.subplots(figsize=(6, 4))
    for name in spectral_df["Dataset"].unique():
        sub = spectral_df[spectral_df["Dataset"] == name]
        ax.plot(
            sub["Normalized Frequency"], sub["Normalized Spectral Density"],
            label=name,
        )
    ax.set_yscale("log")
    ax.set_xlabel("Normalized frequency")
    ax.set_ylabel("Normalized spectral density")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(figures / "spectral_density_datasets.pdf", bbox_inches="tight")
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 4))
    for name in temporal_df["Dataset"].unique():
        sub = temporal_df[temporal_df["Dataset"] == name]
        ax.plot(sub["Normalized Time"], sub["Normalized Energy"], label=name)
    ax.set_xlabel("Normalized time")
    ax.set_ylabel("Normalized energy")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(figures / "temporal_energy_datasets.pdf", bbox_inches="tight")
    plt.close(fig)

    plot_localization_bars(loc_df, save_path=figures / "localization_datasets.pdf")
    plot_localization_joint(
        loc_joint_df, save_path=figures / "localization_joint_datasets.png"
    )
