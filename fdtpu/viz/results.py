"""Results aggregation across runs (reference visualization/results.py +
results_lstm.py — one parametrized module instead of two near-duplicates,
SURVEY.md quirk on results_lstm.py being a copy).

Collects ``results.yaml`` files from many run dirs into a tidy DataFrame,
plots quality bars vs the self/dummy baselines, and emits LaTeX-ready
summary tables (reference results.py:161-491).
"""

from __future__ import annotations

from itertools import product
from pathlib import Path
from typing import Any, Optional

import numpy as np
import pandas as pd
import yaml

PRIMARY_METRICS = [
    "time_sliced_wasserstein_mean",
    "freq_sliced_wasserstein_mean",
    "time_marginal_wasserstein_mean",
    "freq_marginal_wasserstein_mean",
]

#: datamodule name (fdtpu config `datamodule.name`) → paper display name
DATASET_DISPLAY = {
    "ecg": "ECG",
    "mimiciii": "MIMIC-III",
    "nasdaq": "NASDAQ-2019",
    "usdroughts": "US-Droughts",
    "synthetic": "Synthetic",
}


def infer_dataset(config: dict[str, Any]) -> str:
    """Paper display name from a run config (reference results.py:24-48;
    NASA splits on the charge/discharge subdataset)."""
    dm = config.get("datamodule", {}) or {}
    name = str(dm.get("name", "")).lower()
    if name == "nasa":
        sub = str(dm.get("subdataset", "charge")).lower()
        return "NASA-Charge" if sub == "charge" else "NASA-Discharge"
    return DATASET_DISPLAY.get(name, "Unknown")


def infer_diffusion_domain(config: dict[str, Any]) -> str:
    """"Time" or "Frequency" (reference results.py:50-63)."""
    return "Frequency" if config.get("fourier_transform") else "Time"


def calculate_metrics(results: dict[str, Any]) -> list[dict[str, Any]]:
    """Tidy per-distance rows from ``*_wasserstein_all`` lists
    (reference results.py:66-95)."""
    data = []
    for domain, method in product(("time", "freq"), ("sliced", "marginal")):
        key = f"{domain}_{method}_wasserstein_all"
        if key in results:
            data.extend(
                {
                    "Value": distance,
                    "Metric Domain": "Frequency" if domain == "freq" else "Time",
                    "Metric": (
                        "Sliced Wasserstein"
                        if method == "sliced"
                        else "Marginal Wasserstein"
                    ),
                }
                for distance in results[key]
            )
    return data


def calculate_baselines(results: dict[str, Any]) -> list[dict[str, Any]]:
    """Self/dummy baseline rows (reference results.py:97-126)."""
    data = []
    for baseline, domain, method in product(
        ("dummy", "self"), ("time", "freq"), ("sliced", "marginal")
    ):
        key = f"{domain}_{method}_wasserstein_mean_{baseline}"
        if key in results:
            data.append(
                {
                    "Value": results[key],
                    "Baseline": "Mean" if baseline == "dummy" else "Half Train",
                    "Metric Domain": "Frequency" if domain == "freq" else "Time",
                    "Metric": (
                        "Sliced Wasserstein"
                        if method == "sliced"
                        else "Marginal Wasserstein"
                    ),
                }
            )
    return data


def process_results(runs_dir: Path | str) -> pd.DataFrame:
    """One row per run with its config summary and scalar metrics."""
    runs_dir = Path(runs_dir)
    rows = []
    for run in sorted(runs_dir.glob("*")):
        results_path = run / "results.yaml"
        config_path = run / "train_config.yaml"
        if not results_path.exists():
            continue
        with open(results_path) as f:
            results = yaml.safe_load(f)
        row: dict = {"run_id": run.name}
        if config_path.exists():
            with open(config_path) as f:
                cfg = yaml.safe_load(f)
            row.update(
                dataset=cfg.get("datamodule", {}).get("name"),
                backbone=cfg.get("score_model", {}).get("backbone"),
                fourier_transform=cfg.get("fourier_transform"),
                scheduler=cfg.get("score_model", {})
                .get("noise_scheduler", {})
                .get("class"),
            )
        row.update({k: v for k, v in results.items() if not isinstance(v, list)})
        rows.append(row)
    return pd.DataFrame(rows)


def plot_sample_quality(
    df: pd.DataFrame,
    metric: str = "time_sliced_wasserstein_mean",
    save_path: Optional[Path] = None,
):
    """Bar plot of a quality metric per run, with self/dummy baseline lines
    (reference results.py quality figures)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(max(6, 0.9 * len(df)), 4))
    labels = df.get("dataset", df["run_id"]).astype(str) + ":" + df["run_id"].astype(str)
    ax.bar(labels, df[metric])
    for suffix, style in (("_self", "--"), ("_dummy", ":")):
        col = metric + suffix
        if col in df:
            ax.axhline(df[col].mean(), ls=style, color="k", label=col)
    ax.set_ylabel(metric)
    ax.tick_params(axis="x", rotation=45)
    ax.legend()
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150)
        plt.close(fig)
    return fig


def results_to_latex(
    df: pd.DataFrame, metrics: Optional[list[str]] = None
) -> str:
    """LaTeX summary table, mean ± std per (dataset, backbone) group
    (reference results.py LaTeX emitters)."""
    metrics = metrics or [m for m in PRIMARY_METRICS if m in df.columns]
    group_cols = [c for c in ("dataset", "backbone") if c in df.columns]
    if group_cols:
        grouped = df.groupby(group_cols)[metrics]
        summary = grouped.agg(["mean", "std"])
        cells = {}
        for m in metrics:
            cells[m] = (
                summary[(m, "mean")].map("{:.3f}".format)
                + " $\\pm$ "
                + summary[(m, "std")].fillna(0).map("{:.3f}".format)
            )
        table = pd.DataFrame(cells)
    else:
        table = df[metrics].round(3)
    return table.to_latex(escape=False)


def process_all_datasets(
    runs_dir: Path | str, out_dir: Path | str
) -> pd.DataFrame:
    """Full pipeline: aggregate → CSV → quality plots → LaTeX
    (reference results.py:process_all_datasets)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = process_results(runs_dir)
    if df.empty:
        return df
    df.to_csv(out_dir / "results_summary.csv", index=False)
    for metric in PRIMARY_METRICS:
        if metric in df.columns:
            plot_sample_quality(df, metric, save_path=out_dir / f"quality_{metric}.png")
    with open(out_dir / "results_table.tex", "w") as f:
        f.write(results_to_latex(df))
    return df


# --------------------------------------------------------------------------
# Reference-shaped per-distance pipeline (reference results.py:159-491):
# tidy DataFrames over the *_wasserstein_all lists, per-(metric, dataset)
# quality boxes vs baselines, per-run spectral profiles, summary pivots.
# --------------------------------------------------------------------------
def _load_run(run_path: Path) -> Optional[tuple[dict, dict]]:
    config_path = run_path / "train_config.yaml"
    results_path = run_path / "results.yaml"
    if not (config_path.exists() and results_path.exists()):
        return None
    with open(config_path) as f:
        config = yaml.safe_load(f)
    with open(results_path) as f:
        results = yaml.safe_load(f)
    return config, results


def process_run_metrics(
    run_ids: list[str],
    runs_dir: Path | str,
    output_dir: Optional[Path | str] = None,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Per-distance tidy aggregation across runs → (metrics_df, baselines_df)
    with Dataset / Diffusion Domain columns (reference results.py:159-218)."""
    runs_dir = Path(runs_dir)
    df_list, baselines_list = [], []
    for run_id in run_ids:
        loaded = _load_run(runs_dir / run_id)
        if loaded is None:
            continue
        config, results = loaded
        dataset = infer_dataset(config)
        domain = infer_diffusion_domain(config)
        df = pd.DataFrame(calculate_metrics(results))
        df_baselines = pd.DataFrame(calculate_baselines(results))
        for frame in (df, df_baselines):
            frame["Dataset"] = dataset
            frame["Diffusion Domain"] = domain
        df_list.append(df)
        baselines_list.append(df_baselines)
    if not df_list:
        raise ValueError(f"No valid runs found under {runs_dir}")
    df = pd.concat(df_list, ignore_index=True)
    df_baselines = pd.concat(baselines_list, ignore_index=True)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        df.to_csv(output_dir / "metrics.csv", index=False)
        df_baselines.to_csv(output_dir / "baselines.csv", index=False)
    return df, df_baselines


def plot_quality_boxes(
    df: pd.DataFrame,
    df_baselines: pd.DataFrame,
    output_dir: Optional[Path | str] = None,
) -> list:
    """Per-(metric, dataset) box plot of per-distance values split by
    diffusion domain, with baseline markers (reference results.py:221-278)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figs = []
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
    domains = ["Time", "Frequency"]
    for metric in df["Metric"].unique():
        for dataset in df["Dataset"].unique():
            sub = df[(df["Metric"] == metric) & (df["Dataset"] == dataset)]
            if sub.empty:
                continue
            fig, ax = plt.subplots(figsize=(5, 4))
            positions, labels = [], []
            for i, mdomain in enumerate(domains):
                for j, ddomain in enumerate(domains):
                    vals = sub[
                        (sub["Metric Domain"] == mdomain)
                        & (sub["Diffusion Domain"] == ddomain)
                    ]["Value"].values
                    if len(vals) == 0:
                        continue
                    pos = i * 2.4 + j
                    ax.boxplot(
                        [vals], positions=[pos], widths=0.7, showfliers=False
                    )
                    positions.append(pos)
                    labels.append(f"{mdomain[:4]}\n{ddomain[:4]} diff.")
            base = df_baselines[
                (df_baselines["Metric"] == metric)
                & (df_baselines["Dataset"] == dataset)
            ]
            for bl, marker, color in (("Mean", "v", "tab:red"), ("Half Train", "^", "tab:green")):
                for i, mdomain in enumerate(domains):
                    vals = base[
                        (base["Baseline"] == bl)
                        & (base["Metric Domain"] == mdomain)
                    ]["Value"].values
                    if len(vals):
                        ax.plot(
                            [i * 2.4 + 0.5], [vals.mean()], marker=marker,
                            color=color, label=bl if i == 0 else None,
                        )
            ax.set_xticks(positions)
            ax.set_xticklabels(labels, fontsize=7)
            ax.set_ylabel(f"{metric} (lower is better)")
            ax.set_title(dataset)
            if ax.get_legend_handles_labels()[0]:
                ax.legend(fontsize=7, title="Baseline")
            fig.tight_layout()
            if output_dir is not None:
                name = (
                    f"{metric.lower().replace(' ', '_')}_"
                    f"{dataset.lower().replace('-', '_')}.pdf"
                )
                fig.savefig(output_dir / name, bbox_inches="tight")
                plt.close(fig)
            figs.append(fig)
    return figs


def calculate_spectral_profile(
    marginal_spectral: list[float], n_channels: int
) -> np.ndarray:
    """(freq·channels,) spectral marginal-Wasserstein list → per-frequency
    mean over channels (reference results.py:141-157)."""
    arr = np.asarray(marginal_spectral, dtype=np.float64)
    return arr.reshape(-1, n_channels).mean(axis=1)


def process_spectral_analysis(
    run_ids: list[str],
    runs_dir: Path | str,
    output_dir: Optional[Path | str] = None,
) -> pd.DataFrame:
    """Per-run spectral-density Wasserstein profiles → tidy DataFrame
    (reference results.py:281-349).  Channel count comes from samples.npy."""
    runs_dir = Path(runs_dir)
    rows = []
    for run_id in run_ids:
        run_path = runs_dir / run_id
        loaded = _load_run(run_path)
        samples_path = run_path / "samples.npy"
        if loaded is None or not samples_path.exists():
            continue
        config, results = loaded
        if "spectral_marginal_wasserstein_all" not in results:
            continue
        n_channels = int(np.load(samples_path, mmap_mode="r").shape[-1])
        profile = calculate_spectral_profile(
            results["spectral_marginal_wasserstein_all"], n_channels
        )
        freqs = np.arange(len(profile)) / len(profile)
        rows.extend(
            {
                "Dataset": infer_dataset(config),
                "Diffusion Domain": infer_diffusion_domain(config),
                "Frequency": float(freqs[k]),
                "Spectral Density": float(profile[k]),
            }
            for k in range(len(profile))
        )
    if not rows:
        raise ValueError("No spectral data found")
    df = pd.DataFrame(rows)
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        df.to_csv(output_dir / "spectral_density.csv", index=False)
    return df


def plot_run_spectral_density(
    spectral_df: pd.DataFrame, output_dir: Optional[Path | str] = None
) -> list:
    """Per-dataset spectral Wasserstein profile, time-vs-frequency diffusion
    (reference results.py:352-390)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    figs = []
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
    for dataset in spectral_df["Dataset"].unique():
        sub = spectral_df[spectral_df["Dataset"] == dataset]
        fig, ax = plt.subplots(figsize=(5, 4))
        for domain in ("Time", "Frequency"):
            dsub = sub[sub["Diffusion Domain"] == domain]
            if dsub.empty:
                continue
            grouped = dsub.groupby("Frequency")["Spectral Density"].mean()
            ax.plot(grouped.index, grouped.values, label=f"{domain} diff.")
        ax.set_yscale("log")
        ax.set_xlabel("Normalized frequency")
        ax.set_ylabel("Wasserstein distance on spectral density")
        ax.set_title(dataset)
        ax.legend()
        fig.tight_layout()
        if output_dir is not None:
            name = f"spectral_density_{dataset.lower().replace('-', '_')}.pdf"
            fig.savefig(output_dir / name, bbox_inches="tight")
            plt.close(fig)
        figs.append(fig)
    return figs


def create_summary_table(
    df: pd.DataFrame,
    metric_name: str = "Sliced Wasserstein",
    output_dir: Optional[Path | str] = None,
) -> pd.DataFrame:
    """mean ± 2·sem pivot per (Dataset, Metric Domain) × Diffusion Domain
    with CSV + LaTeX outputs (reference results.py:393-449)."""
    sub = df[df["Metric"] == metric_name]
    if sub.empty:
        raise ValueError(f"No data found for metric: {metric_name}")
    mean = pd.pivot_table(
        sub, index=["Dataset", "Metric Domain"], columns="Diffusion Domain",
        values="Value", aggfunc="mean",
    )
    sem = pd.pivot_table(
        sub, index=["Dataset", "Metric Domain"], columns="Diffusion Domain",
        values="Value", aggfunc=lambda x: x.std() / (len(x) ** 0.5),
    )
    pivot = pd.concat([mean, sem], keys=["mean", "sem"], axis=1).round(3)
    formatted = (
        "$" + pivot["mean"].astype(str) + r" \ \pm \ "
        + (2 * pivot["sem"]).round(3).astype(str) + "$"
    )
    if output_dir is not None:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        stem = metric_name.lower().replace(" ", "_")
        pivot.to_csv(output_dir / f"{stem}_summary.csv")
        formatted.to_latex(output_dir / f"{stem}.tex", escape=False)
    return pivot


def results_main(
    run_ids: list[str],
    runs_dir: Path | str,
    output_dir: Path | str,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Full reference results pipeline (reference results.py:452-491):
    metrics/baselines CSVs → quality boxes → summary tables → spectral
    profiles."""
    output_dir = Path(output_dir)
    df, df_baselines = process_run_metrics(run_ids, runs_dir, output_dir)
    plot_quality_boxes(df, df_baselines, output_dir / "figures")
    for metric in df["Metric"].unique():
        create_summary_table(df, metric, output_dir / "tables")
    try:
        spectral_df = process_spectral_analysis(run_ids, runs_dir, output_dir)
        plot_run_spectral_density(spectral_df, output_dir / "figures")
    except ValueError:
        pass
    return df, df_baselines
