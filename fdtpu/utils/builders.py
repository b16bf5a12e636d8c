"""Builders: config dicts → framework objects (registry-based instantiation).

The reference uses Hydra ``_target_`` instantiation; here explicit registries
map group names to classes (SURVEY.md §5.6 functional parity).
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Any, Optional

import jax

from fdtpu.data.datamodules import DATAMODULE_REGISTRY, Datamodule
from fdtpu.diffusion.sde import SDE, VEScheduler, VPScheduler
from fdtpu.metrics import MarginalWasserstein, MetricCollection, SlicedWasserstein
from fdtpu.models.score_models import ScoreModel, ScoreModelConfig, init_score_model

METRIC_REGISTRY = {
    "SlicedWasserstein": SlicedWasserstein,
    "MarginalWasserstein": MarginalWasserstein,
}


def build_datamodule(cfg: dict[str, Any]) -> Datamodule:
    dm_cfg = dict(cfg["datamodule"])
    name = dm_cfg.pop("name")
    cls = DATAMODULE_REGISTRY[name]
    return cls(**dm_cfg)


def build_scheduler(cfg: dict[str, Any], max_len: Optional[int] = None) -> SDE:
    sm = cfg["score_model"]
    ns = dict(sm["noise_scheduler"])
    cls_name = ns.pop("class")
    ns.pop("name", None)
    cls = {"VPScheduler": VPScheduler, "VEScheduler": VEScheduler}[cls_name]
    scheduler = cls(
        fourier_noise_scaling=bool(sm.get("fourier_noise_scaling", False)), **ns
    )
    if max_len is not None:
        scheduler = scheduler.with_noise_scaling(max_len)
    return scheduler


def build_model(
    cfg: dict[str, Any],
    dataset_params: dict[str, Any],
    key: Optional[jax.Array] = None,
) -> ScoreModel:
    """Complete the partial score-model config with dataset-derived params
    (reference cmd/train.py:50-52) and initialize."""
    sm = dict(cfg["score_model"])
    sm.pop("noise_scheduler", None)
    sm.pop("name", None)
    lr_max = float(sm.pop("lr_max", 1e-3))
    likelihood_weighting = bool(sm.pop("likelihood_weighting", False))
    sm.pop("fourier_noise_scaling", None)

    model_cfg = ScoreModelConfig(
        n_channels=dataset_params["n_channels"],
        max_len=dataset_params["max_len"],
        **{k: v for k, v in sm.items() if k in ScoreModelConfig.__dataclass_fields__},
    )
    if key is None:
        key = jax.random.PRNGKey(cfg.get("random_seed", 42))
    variables = init_score_model(key, model_cfg)
    scheduler = build_scheduler(cfg, max_len=model_cfg.max_len)
    model = ScoreModel(
        config=model_cfg,
        variables=variables,
        scheduler=scheduler,
        num_training_steps=int(dataset_params["num_training_steps"]),
        lr_max=lr_max,
        likelihood_weighting=likelihood_weighting,
    )
    logging.info("Initialized %s model with %d parameters", model_cfg.backbone, model.param_count())
    return model


def build_metrics(cfg: dict[str, Any], original_samples) -> MetricCollection:
    m_cfg = cfg["metrics"]
    factories = []
    for entry in m_cfg["metrics"]:
        entry = dict(entry)
        cls = METRIC_REGISTRY[entry.pop("type")]
        factories.append(partial(cls, **entry))
    return MetricCollection(
        metrics=factories,
        original_samples=original_samples,
        include_baselines=bool(m_cfg.get("include_baselines", True)),
        include_spectral_density=bool(m_cfg.get("include_spectral_density", False)),
    )


def resolve_model_dir(model_path: Path | str, model_id: str) -> Path:
    """Resolve a run directory; ``latest`` picks the newest run containing a
    train_config.yaml (reference benchmark_cache.py:126-137)."""
    model_path = Path(model_path)
    model_id = str(model_id)
    if model_id != "latest":
        model_dir = model_path / model_id
        if not (model_dir / "train_config.yaml").exists():
            available = sorted(
                p.name for p in model_path.glob("*") if (p / "train_config.yaml").exists()
            )
            raise FileNotFoundError(
                f"No run {model_id} in {model_path}. Available: {available}"
            )
        return model_dir
    candidates = [
        p for p in model_path.glob("*") if (p / "train_config.yaml").exists()
    ]
    if not candidates:
        raise FileNotFoundError(f"No runs with train_config.yaml in {model_path}")
    return max(candidates, key=lambda p: p.stat().st_mtime)
