"""Results aggregation across runs (reference visualization/results.py +
results_lstm.py — one parametrized module instead of two near-duplicates,
SURVEY.md quirk on results_lstm.py being a copy).

Collects ``results.yaml`` files from many run dirs into a tidy DataFrame,
plots quality bars vs the self/dummy baselines, and emits LaTeX-ready
summary tables (reference results.py:161-491).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import pandas as pd
import yaml

PRIMARY_METRICS = [
    "time_sliced_wasserstein_mean",
    "freq_sliced_wasserstein_mean",
    "time_marginal_wasserstein_mean",
    "freq_marginal_wasserstein_mean",
]


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
