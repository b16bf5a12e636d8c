"""Full viz-pipeline tests on synthetic run dirs: the reference-shaped
results pipeline (per-distance frames, quality boxes, spectral profiles,
summary tables — reference results.py:24-491), the dataset batch processing
(reference spectral_interpretation.py:34-209, 321-357), and the five
benchmark figure families (reference cmd/benchmark_cache.py:462-598)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest
import yaml

pytest.importorskip("matplotlib")

from fdtpu.viz import (
    calculate_spectral_profile,
    create_benchmark_figures,
    create_summary_table,
    infer_dataset,
    infer_diffusion_domain,
    parse_sweep_params,
    plot_localization_joint,
    process_all_dataset_spectra,
    process_run_metrics,
    results_main,
    spectral_interpretation_main,
)


def _make_run(runs_dir: Path, run_id: str, dataset: str, fourier: bool,
              n_channels: int = 1, max_len: int = 16):
    rng = np.random.default_rng(hash(run_id) % 2**32)
    run = runs_dir / run_id
    run.mkdir(parents=True)
    config = {
        "datamodule": {"name": dataset},
        "fourier_transform": fourier,
        "score_model": {"backbone": "transformer"},
    }
    (run / "train_config.yaml").write_text(yaml.safe_dump(config))
    n_spec = (max_len // 2 + 1) * n_channels
    results = {
        "time_sliced_wasserstein_all": rng.uniform(0.1, 0.3, 20).tolist(),
        "freq_sliced_wasserstein_all": rng.uniform(0.1, 0.3, 20).tolist(),
        "time_marginal_wasserstein_all": rng.uniform(0.1, 0.3, max_len).tolist(),
        "freq_marginal_wasserstein_all": rng.uniform(0.1, 0.3, max_len).tolist(),
        "time_sliced_wasserstein_mean_self": 0.12,
        "time_sliced_wasserstein_mean_dummy": 0.5,
        "freq_marginal_wasserstein_mean_self": 0.1,
        "spectral_marginal_wasserstein_all": rng.uniform(0.01, 1.0, n_spec).tolist(),
    }
    (run / "results.yaml").write_text(yaml.safe_dump(results))
    np.save(run / "samples.npy", rng.normal(size=(8, max_len, n_channels)))
    return run


def test_infer_dataset_and_domain():
    assert infer_dataset({"datamodule": {"name": "ecg"}}) == "ECG"
    assert (
        infer_dataset({"datamodule": {"name": "nasa", "subdataset": "discharge"}})
        == "NASA-Discharge"
    )
    assert infer_dataset({"datamodule": {"name": "nasa"}}) == "NASA-Charge"
    assert infer_dataset({"datamodule": {"name": "whatever"}}) == "Unknown"
    assert infer_diffusion_domain({"fourier_transform": True}) == "Frequency"
    assert infer_diffusion_domain({}) == "Time"


def test_results_main_pipeline(tmp_path):
    runs = tmp_path / "runs"
    _make_run(runs, "run_a", "ecg", fourier=True)
    _make_run(runs, "run_b", "ecg", fourier=False)
    _make_run(runs, "run_c", "nasdaq", fourier=True)
    out = tmp_path / "out"
    df, df_base = results_main(["run_a", "run_b", "run_c"], runs, out)

    assert set(df["Dataset"]) == {"ECG", "NASDAQ-2019"}
    assert set(df["Diffusion Domain"]) == {"Time", "Frequency"}
    assert (out / "metrics.csv").exists()
    assert (out / "baselines.csv").exists()
    assert (out / "spectral_density.csv").exists()
    # quality box figures per (metric, dataset)
    figs = list((out / "figures").glob("*.pdf"))
    assert any("sliced_wasserstein_ecg" in f.name for f in figs)
    assert any("spectral_density_" in f.name for f in figs)
    # summary tables: CSV + LaTeX per metric
    assert (out / "tables" / "sliced_wasserstein_summary.csv").exists()
    assert (out / "tables" / "sliced_wasserstein.tex").exists()


def test_summary_table_values(tmp_path):
    df = pd.DataFrame(
        {
            "Metric": ["Sliced Wasserstein"] * 4,
            "Metric Domain": ["Time", "Time", "Time", "Time"],
            "Diffusion Domain": ["Time", "Time", "Frequency", "Frequency"],
            "Dataset": ["ECG"] * 4,
            "Value": [0.1, 0.3, 0.2, 0.4],
        }
    )
    pivot = create_summary_table(df, "Sliced Wasserstein")
    assert pivot[("mean", "Time")].iloc[0] == pytest.approx(0.2)
    assert pivot[("mean", "Frequency")].iloc[0] == pytest.approx(0.3)


def test_calculate_spectral_profile_channel_mean():
    flat = [1.0, 3.0, 2.0, 4.0]  # (freq=2, channels=2)
    prof = calculate_spectral_profile(flat, n_channels=2)
    np.testing.assert_allclose(prof, [2.0, 3.0])


def test_process_run_metrics_skips_incomplete(tmp_path):
    runs = tmp_path / "runs"
    _make_run(runs, "good", "ecg", fourier=True)
    (runs / "incomplete").mkdir()
    df, _ = process_run_metrics(["good", "incomplete", "absent"], runs)
    assert set(df["Dataset"]) == {"ECG"}
    with pytest.raises(ValueError):
        process_run_metrics(["absent"], runs)


def test_spectral_interpretation_batch(tmp_path):
    """Registry batch processing over synthetic datamodule-like objects."""

    class FakeDM:
        def __init__(self, seed):
            rng = np.random.default_rng(seed)
            self.X_train = rng.normal(size=(12, 16, 2)).astype(np.float32)

        def prepare_data(self):
            pass

        def setup(self, stage="fit"):
            pass

    class BrokenDM(FakeDM):
        def setup(self, stage="fit"):
            raise FileNotFoundError("raw files missing")

    out = tmp_path / "out"
    registry = {"A": FakeDM(0), "B": FakeDM(1), "Broken": BrokenDM(2)}
    spectral_interpretation_main(tmp_path, out, registry=registry)

    spec_df = pd.read_csv(out / "spectral_density_datasets.csv")
    assert set(spec_df["Dataset"]) == {"A", "B"}  # Broken skipped
    assert (out / "temporal_energy_datasets.csv").exists()
    assert (out / "localization_datasets.csv").exists()
    assert (out / "localization_joint_datasets.csv").exists()
    assert (out / "figures" / "spectral_density_datasets.pdf").exists()
    assert (out / "figures" / "temporal_energy_datasets.pdf").exists()
    assert (out / "figures" / "localization_datasets.pdf").exists()
    assert (out / "figures" / "localization_joint_datasets.png").exists()

    joint = pd.read_csv(out / "localization_joint_datasets.csv")
    fig = plot_localization_joint(joint)
    assert fig is not None


def test_spectral_batch_raises_when_all_fail(tmp_path):
    class BrokenDM:
        def prepare_data(self):
            raise FileNotFoundError("nope")

    with pytest.raises(ValueError):
        process_all_dataset_spectra(tmp_path, registry={"X": BrokenDM()})


def test_benchmark_figure_families(tmp_path):
    df = pd.DataFrame(
        [
            {"method": "baseline", "time_s": 10.0, "samples_per_s": 12.8},
            {"method": "e2crf_score", "time_s": 1.0, "samples_per_s": 128.0,
             "speedup": 10.0, "cache_cache_hit_ratio": 0.95,
             "cache_steps_skipped_ratio": 0.95, "sw_vs_baseline": 0.2},
            {"method": "score_R5", "time_s": 2.0, "speedup": 5.0,
             "cache_cache_hit_ratio": 0.8},
            {"method": "score_R20", "time_s": 1.5, "speedup": 6.7,
             "cache_cache_hit_ratio": 0.9},
            {"method": "score_tau0.05", "time_s": 2.5, "speedup": 4.0,
             "cache_cache_hit_ratio": 0.7},
            {"method": "kv_K5", "time_s": 12.0, "speedup": 0.8,
             "cache_cache_hit_ratio": 0.1},
            {"method": "token_b24", "time_s": 2.5, "speedup": 4.0,
             "cache_cache_hit_ratio": 0.86, "sw_vs_baseline": 0.36},
        ]
    )
    parsed = parse_sweep_params(df)
    assert parsed.loc[parsed["method"] == "score_R20", "Parameter"].iloc[0] == "R"
    assert parsed.loc[parsed["method"] == "token_b24", "Value"].iloc[0] == 24

    written = create_benchmark_figures(df, tmp_path, model_id="testmodel")
    names = {p.name for p in written}
    assert "speedup_comparison_testmodel.pdf" in names
    assert "time_comparison_testmodel.pdf" in names
    assert "cache_hit_vs_speedup_testmodel.pdf" in names
    assert "ablation_r_testmodel.pdf" in names
    assert "ablation_tau_0_testmodel.pdf" in names
    assert "ablation_token_budget_testmodel.pdf" in names
    assert "summary_table_testmodel.pdf" in names
    for p in written:
        assert p.exists() and p.stat().st_size > 0


def test_shape_scaling_figure(tmp_path):
    from fdtpu.viz.benchmark_figures import shape_scaling_figure

    payload = {
        "shapes": {
            "ecg": {"max_len": 187, "n_channels": 1, "speedup": 18.5,
                    "steps_skipped_ratio": 0.96},
            "droughts": {"max_len": 365, "n_channels": 13, "speedup": 7.2,
                         "steps_skipped_ratio": 0.95},
            "failed": {"max_len": 251, "n_channels": 4, "speedup": None},
        }
    }
    path = shape_scaling_figure(payload, tmp_path)
    assert path is not None and path.exists() and path.stat().st_size > 0
    assert (path.parent / "shape_scaling.png").exists()
    # No measured shapes -> no figure, no crash.
    assert shape_scaling_figure({"shapes": {}}, tmp_path) is None
