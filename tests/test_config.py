"""Config composition tests (functional analog of reference
tests/test_hydra_configs.py — every config composes and builds)."""

from pathlib import Path

import pytest

from fdtpu.utils.builders import build_datamodule, build_metrics, build_scheduler
from fdtpu.utils.config import compose_config, flatten_config, dict_to_str

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


def test_train_config_composes():
    cfg = compose_config(CONFIG_DIR, "train", [])
    assert cfg["random_seed"] == 42
    assert cfg["score_model"]["name"] == "default"
    assert cfg["score_model"]["d_model"] == 72
    assert cfg["score_model"]["noise_scheduler"]["class"] == "VPScheduler"
    assert cfg["datamodule"]["name"] == "ecg"
    # Interpolation: fourier_noise_scaling mirrors fourier_transform.
    assert cfg["score_model"]["fourier_noise_scaling"] is False


def test_group_and_value_overrides():
    cfg = compose_config(
        CONFIG_DIR,
        "train",
        [
            "datamodule=synthetic",
            "fourier_transform=true",
            "score_model=lstm",
            "trainer.max_epochs=7",
            "score_model.noise_scheduler=vesde",
        ],
    )
    assert cfg["datamodule"]["name"] == "synthetic"
    assert cfg["score_model"]["backbone"] == "lstm"
    assert cfg["trainer"]["max_epochs"] == 7
    assert cfg["score_model"]["fourier_noise_scaling"] is True
    assert cfg["datamodule"]["fourier_transform"] is True
    assert cfg["score_model"]["noise_scheduler"]["class"] == "VEScheduler"


def test_plus_override_adds_keys():
    cfg = compose_config(CONFIG_DIR, "sample", ["+cache_kwargs.K=5", "use_cache=true"])
    assert cfg["cache_kwargs"]["K"] == 5
    with pytest.raises(KeyError):
        compose_config(CONFIG_DIR, "sample", ["nonexistent.key=1"])


def test_list_index_override():
    cfg = compose_config(
        CONFIG_DIR, "sample", ["metrics.metrics.0.num_directions=17"]
    )
    assert cfg["metrics"]["metrics"][0]["num_directions"] == 17
    # Interpolation inside list entries resolved.
    assert cfg["metrics"]["metrics"][0]["random_seed"] == 42


@pytest.mark.parametrize(
    "datamodule", ["ecg", "synthetic", "mimiciii", "nasdaq", "nasa", "usdroughts"]
)
def test_all_datamodule_configs_build(datamodule, tmp_path):
    cfg = compose_config(
        CONFIG_DIR, "train",
        [f"datamodule={datamodule}", f"datamodule.data_dir={tmp_path}"],
    )
    dm = build_datamodule(cfg)
    assert dm.dataset_name in str(dm.data_dir)


@pytest.mark.parametrize("score_model", ["default", "mlp", "lstm"])
@pytest.mark.parametrize("scheduler", ["vpsde", "vesde"])
def test_all_model_scheduler_configs_build(score_model, scheduler):
    cfg = compose_config(
        CONFIG_DIR, "train",
        [f"score_model={score_model}", f"score_model.noise_scheduler={scheduler}"],
    )
    sde = build_scheduler(cfg, max_len=20)
    assert sde.G is not None


def test_metrics_config_builds():
    import numpy as np

    cfg = compose_config(CONFIG_DIR, "sample", ["metrics.metrics.0.num_directions=5"])
    coll = build_metrics(cfg, original_samples=np.random.randn(20, 10, 2).astype("f"))
    out = coll(np.random.randn(10, 10, 2).astype("f"))
    assert "time_sliced_wasserstein_mean" in out


def test_flatten_and_str():
    cfg = compose_config(CONFIG_DIR, "train", [])
    flat = flatten_config(cfg)
    assert "d_model" in flat
    assert isinstance(dict_to_str(flat), str)


def test_timestamp_run_id_override_stays_string():
    # YAML 1.1 would read "20260816_201855" as int 20260816201855 (underscore
    # stripped) — run-id overrides must survive verbatim.
    cfg = compose_config(CONFIG_DIR, "sample", ["model_id=20260816_201855"])
    assert cfg["model_id"] == "20260816_201855"
