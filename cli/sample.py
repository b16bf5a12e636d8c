#!/usr/bin/env python
"""Sampling CLI (reference `/root/reference/cmd/sample.py`).

Usage:
    python cli/sample.py model_id=<run_id> [num_samples=... use_cache=true ...]

Loads the run's ``train_config.yaml``, rebuilds the datamodule, restores the
best checkpoint, samples (optionally E²-CRF-cached / FreSca-scaled), maps
samples back to the data domain, evaluates Wasserstein metrics against the
training data, and writes ``results.yaml`` + ``samples.npy`` into the run dir.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

if os.environ.get("FDTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])
import jax.numpy as jnp
import numpy as np
import yaml

from fdtpu.data.dataset import DiffusionDataset
from fdtpu.ops import idft
from fdtpu.sampling import DiffusionSampler
from fdtpu.train import get_best_checkpoint, load_checkpoint
from fdtpu.utils.builders import build_datamodule, build_metrics, resolve_model_dir
from fdtpu.utils.config import compose_config, load_config, save_config

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


class SamplingRunner:
    """Mirrors reference SamplingRunner (cmd/sample.py:18-135)."""

    def __init__(self, cfg: dict) -> None:
        self.cfg = cfg
        self.model_dir = resolve_model_dir(cfg["model_path"], cfg["model_id"])
        logging.info("Sampling from run %s", self.model_dir)

        self.train_cfg = load_config(self.model_dir / "train_config.yaml")
        self.datamodule = build_datamodule(self.train_cfg)
        self.datamodule.prepare_data()
        self.datamodule.setup("fit")

        ckpt = get_best_checkpoint(self.model_dir / "checkpoints")
        logging.info("Loading checkpoint %s", ckpt)
        # attention_impl is a hardware choice, not part of the weights:
        # `attention_impl=auto` picks the fused kernel on TPU regardless of
        # what the training run recorded.
        overrides = (
            {"attention_impl": cfg["attention_impl"]}
            if cfg.get("attention_impl")
            else {}
        )
        self.model = load_checkpoint(ckpt, **overrides)

        sampler_cfg = dict(cfg["sampler"])
        sampler_cfg.pop("name", None)
        # Reference-compatible override forms: cache flags may live at the
        # root (sample.yaml) or under the sampler group
        # (``+sampler.use_cache=true``, README.md:179) — sampler-level wins.
        use_cache = bool(sampler_cfg.pop("use_cache", cfg.get("use_cache", False)))
        cache_kwargs = sampler_cfg.pop("cache_kwargs", None) or cfg.get("cache_kwargs") or {}
        use_fresca = bool(sampler_cfg.pop("use_fresca", cfg.get("use_fresca", False)))
        # Opt-in quality-constrained τ₀ calibration (``+calibrate_tau=true``):
        # pilot-sample the restored model and pick the largest skip budget
        # whose quality stays within the uncached noise floor with the guard
        # silent (fdtpu/sampling/calibrate.py).  Overrides any tau_0 in
        # cache_kwargs; falls back to uncached sampling when no ladder arm
        # is safe.
        self.calibration = None
        if use_cache and bool(
            sampler_cfg.pop("calibrate_tau", cfg.get("calibrate_tau", False))
        ):
            from fdtpu.sampling import calibrate_tau_0

            cal_kwargs = dict(cfg.get("calibrate_kwargs") or {})
            pilot_n = int(
                cal_kwargs.pop("num_samples", min(int(cfg["num_samples"]), 128))
            )
            batch = min(
                int(sampler_cfg.get("sample_batch_size", pilot_n)), pilot_n
            )
            self.calibration = calibrate_tau_0(
                self.model,
                num_samples=pilot_n,
                num_diffusion_steps=int(cfg["num_diffusion_steps"]),
                sample_batch_size=batch,
                key=jax.random.PRNGKey(int(cfg["random_seed"]) + 1),
                cache_kwargs=cache_kwargs,
                **cal_kwargs,
            )
            if self.calibration.tau_0 is None:
                logging.warning(
                    "tau_0 calibration: no ladder arm stayed within the "
                    "noise floor with a silent guard — sampling UNCACHED. "
                    "Arms: %s", self.calibration.arms,
                )
                use_cache = False
            else:
                cache_kwargs = self.calibration.cache_kwargs
                logging.info(
                    "tau_0 calibration: chose tau_0=%s (floor %.4g): %s",
                    self.calibration.tau_0,
                    self.calibration.sw_noise_floor,
                    self.calibration.accepted,
                )
        self.sampler = DiffusionSampler(
            self.model,
            use_cache=use_cache,
            cache_kwargs=cache_kwargs,
            use_fresca=use_fresca,
            **(cfg.get("fresca_kwargs") or {}),
            **sampler_cfg,
        )
        self.metrics = build_metrics(cfg, original_samples=self.datamodule.X_train)
        self.train_set = DiffusionDataset(
            X=self.datamodule.X_train,
            fourier_transform=self.datamodule.fourier_transform,
            standardize=self.datamodule.standardize,
        )

    def sample(self) -> None:
        cfg = self.cfg
        x = self.sampler.sample(
            int(cfg["num_samples"]),
            int(cfg["num_diffusion_steps"]),
            key=jax.random.PRNGKey(int(cfg["random_seed"])),
        )
        # Back to the data domain (reference cmd/sample.py:107-113).
        if self.datamodule.standardize:
            x = x * self.train_set.feature_std + self.train_set.feature_mean
        if self.datamodule.fourier_transform:
            x = np.asarray(idft(jnp.asarray(x)))

        results = self.metrics(x)
        results_scalar = {k: v for k, v in results.items() if not isinstance(v, list)}
        logging.info("Metrics:\n%s", yaml.safe_dump(results_scalar))

        save_config(cfg, self.model_dir / "sample_config.yaml")
        with open(self.model_dir / "results.yaml", "w") as f:
            yaml.safe_dump(results, f)
        np.save(self.model_dir / "samples.npy", x)
        if self.sampler.use_cache:
            # Cached samples also land in samples_cache/ (reference
            # cmd/sample.py:120-135 layout).
            cache_dir = self.model_dir / "samples_cache"
            cache_dir.mkdir(exist_ok=True)
            np.save(cache_dir / "samples.npy", x)
            stats = self.sampler.get_cache_stats()
            with open(self.model_dir / "cache_stats.yaml", "w") as f:
                yaml.safe_dump(stats, f)
            logging.info("Cache stats: %s", stats)
        if self.calibration is not None:
            import dataclasses

            with open(self.model_dir / "calibration.yaml", "w") as f:
                yaml.safe_dump(
                    {
                        "tau_0": self.calibration.tau_0,
                        "sw_noise_floor": float(self.calibration.sw_noise_floor),
                        "arms": [
                            dataclasses.asdict(a) for a in self.calibration.arms
                        ],
                    },
                    f,
                )
        logging.info("Saved results.yaml and samples.npy to %s", self.model_dir)


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s", force=True)
    cfg = compose_config(CONFIG_DIR, "sample", sys.argv[1:])
    runner = SamplingRunner(cfg)
    runner.sample()


if __name__ == "__main__":
    main()
