"""Visualization smoke tests (figures render and files are written)."""

import numpy as np
import pytest
import yaml

from fdtpu.viz import (
    plot_delocalization,
    plot_sample_heatmap,
    plot_sample_lines,
    plot_spectral_density,
    plot_temporal_energy,
    process_all_datasets,
    process_results,
    results_to_latex,
    visualize_samples,
)


@pytest.fixture
def samples():
    return np.random.RandomState(0).randn(32, 40, 2).astype(np.float32)


def test_sample_plots(samples, tmp_path):
    plot_sample_lines(samples, reference=samples, save_path=tmp_path / "lines.png")
    plot_sample_heatmap(samples, save_path=tmp_path / "heat.png")
    assert (tmp_path / "lines.png").exists()
    assert (tmp_path / "heat.png").exists()


def test_visualize_run_dir(samples, tmp_path):
    np.save(tmp_path / "samples.npy", samples)
    paths = visualize_samples(tmp_path, reference=samples)
    assert all(p.exists() for p in paths)


def test_spectral_figures(samples, tmp_path):
    plot_spectral_density(samples, other=samples + 0.1, save_path=tmp_path / "sd.png")
    plot_temporal_energy(samples, save_path=tmp_path / "te.png")
    plot_delocalization({"a": samples, "b": samples * 2}, save_path=tmp_path / "dl.png")
    assert (tmp_path / "sd.png").exists()
    assert (tmp_path / "te.png").exists()
    assert (tmp_path / "dl.png").exists()


def test_results_pipeline(tmp_path):
    runs = tmp_path / "runs"
    for i, ds in enumerate(["ecg", "synthetic"]):
        run = runs / f"run{i}"
        run.mkdir(parents=True)
        with open(run / "results.yaml", "w") as f:
            yaml.safe_dump(
                {
                    "time_sliced_wasserstein_mean": 0.1 * (i + 1),
                    "time_sliced_wasserstein_mean_self": 0.05,
                    "time_sliced_wasserstein_mean_dummy": 0.5,
                    "freq_sliced_wasserstein_mean": 0.2,
                    "time_sliced_wasserstein_all": [0.1, 0.2],
                },
                f,
            )
        with open(run / "train_config.yaml", "w") as f:
            yaml.safe_dump(
                {
                    "datamodule": {"name": ds},
                    "score_model": {
                        "backbone": "transformer",
                        "noise_scheduler": {"class": "VPScheduler"},
                    },
                    "fourier_transform": False,
                },
                f,
            )

    df = process_results(runs)
    assert len(df) == 2
    assert "time_sliced_wasserstein_all" not in df.columns  # lists dropped
    assert set(df["dataset"]) == {"ecg", "synthetic"}

    out = tmp_path / "out"
    df2 = process_all_datasets(runs, out)
    assert (out / "results_summary.csv").exists()
    assert (out / "results_table.tex").exists()
    assert (out / "quality_time_sliced_wasserstein_mean.png").exists()
    latex = results_to_latex(df2)
    assert "pm" in latex or "0.1" in latex


def test_model_comparison_grids(tmp_path):
    """Multi-domain sample-comparison grids (reference visualize.py:80-206,
    316-346): freq + time runs + training data, line and heatmap variants."""
    from fdtpu.viz import load_samples, visualize_model_comparison

    runs = tmp_path / "runs"
    rng = np.random.RandomState(0)
    for run_id in ("freq_run", "time_run"):
        run = runs / run_id
        run.mkdir(parents=True)
        np.save(run / "samples.npy", rng.randn(12, 30, 2).astype(np.float32))
        with open(run / "train_config.yaml", "w") as f:
            yaml.safe_dump(
                {
                    "datamodule": {
                        "name": "synthetic",
                        "data_dir": str(tmp_path / "data"),
                        "max_len": 30,
                        "num_samples": 16,
                        "batch_size": 4,
                        "fourier_transform": False,
                        "standardize": False,
                    },
                },
                f,
            )

    model_ids = {"freq": "freq_run", "time": "time_run"}
    loaded = load_samples(model_ids, runs, include_train=True, random_seed=0)
    assert set(loaded) == {"freq", "time", "train"}
    assert loaded["train"].shape[1] == 30

    paths = visualize_model_comparison(
        model_ids, runs, tmp_path / "out", dataset_name="synthetic", n_samples=3
    )
    names = {p.name for p in paths}
    assert names == {"synthetic_samples_line.png", "synthetic_samples_heatmap.png"}
    assert all(p.exists() for p in paths)
