#!/usr/bin/env python
"""Training CLI (reference `/root/reference/cmd/train.py`).

Usage:
    python cli/train.py [overrides...]
    python cli/train.py datamodule=synthetic fourier_transform=true \\
        trainer.max_epochs=10 score_model=lstm

Composes ``configs/train.yaml``, builds the datamodule and score model,
saves the config snapshot into the run dir, and fits.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

# The container sitecustomize imports jax before CLI code runs, so the
# JAX_PLATFORMS env var is already snapshotted; FDTPU_PLATFORM=cpu forces
# the backend through the config API instead.
if os.environ.get("FDTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])

from fdtpu.train import Trainer
from fdtpu.train.trainer import get_training_params
from fdtpu.utils.builders import build_datamodule, build_model
from fdtpu.utils.config import compose_config, dict_to_str, flatten_config, save_config

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


class TrainingRunner:
    """Mirrors reference TrainingRunner (cmd/train.py:19-63)."""

    def __init__(self, cfg: dict) -> None:
        self.cfg = cfg
        logging.info("Training config:\n%s", dict_to_str(flatten_config(cfg)))

        self.datamodule = build_datamodule(cfg)
        self.datamodule.prepare_data()
        self.datamodule.setup("fit")

        trainer_cfg = dict(cfg["trainer"])
        trainer_cfg.pop("name", None)
        trainer_cfg.pop("sampling_callback", None)
        self.trainer = Trainer(
            run_dir=cfg.get("run_dir", "lightning_logs"),
            run_id=cfg.get("run_id"),
            seed=int(cfg.get("random_seed", 42)),
            **{
                k: v
                for k, v in trainer_cfg.items()
                if k in (
                    "max_epochs", "gradient_clip_val", "log_every_n_steps",
                    "use_mesh", "accumulate_grad_batches", "steps_per_call",
                    "epochs_per_call",
                )
            },
        )

        # Persist the config for cli/sample.py (reference cmd/train.py:40-43).
        save_config(cfg, self.trainer.run_dir / "train_config.yaml")

        params = get_training_params(
            self.datamodule,
            self.trainer.max_epochs,
            accumulate_grad_batches=self.trainer.accumulate_grad_batches,
        )
        self.model = build_model(cfg, params, key=jax.random.PRNGKey(cfg["random_seed"]))

        # Fourier noise scaling requires frequency-domain data
        # (reference cmd/train.py:60-62).
        if self.model.scheduler.fourier_noise_scaling:
            assert cfg["fourier_transform"], (
                "fourier_noise_scaling=true requires fourier_transform=true"
            )

        # Optional timed method comparison (reference
        # DiffusionMethodComparisonCallback, trainer=diffusion_comparison).
        dc = cfg["trainer"].get("diffusion_comparison") or {}
        if dc.get("enabled"):
            from fdtpu.train.callbacks import DiffusionMethodComparisonCallback

            self.trainer.callbacks.append(
                DiffusionMethodComparisonCallback(
                    model_template=self.model,
                    methods=dc.get("methods", []),
                    every_n_epochs=int(dc.get("every_n_epochs", 1)),
                    num_samples=int(dc.get("num_samples", 5)),
                    warmup_steps=int(dc.get("warmup_steps", 2)),
                    sample_batch_size=int(dc.get("num_samples", 5)),
                    random_seed=int(cfg.get("random_seed", 42)),
                )
            )

        # Optional per-epoch sampling evaluation (reference SamplingCallback).
        sc = cfg["trainer"].get("sampling_callback") or {}
        if sc.get("enabled"):
            from fdtpu.train.callbacks import SamplingCallback

            self.trainer.callbacks.append(
                SamplingCallback(
                    datamodule=self.datamodule,
                    model_template=self.model,
                    every_n_epochs=int(sc.get("every_n_epochs", 10)),
                    sample_batch_size=int(sc.get("sample_batch_size", 64)),
                    num_samples=int(sc.get("num_samples", 200)),
                    num_diffusion_steps=int(sc.get("num_diffusion_steps", 1000)),
                    num_directions=int(sc.get("num_directions", 200)),
                    random_seed=int(cfg.get("random_seed", 42)),
                )
            )

    def train(self) -> None:
        self.trainer.fit(self.model, self.datamodule)
        logging.info(
            "Run %s finished; best val/loss %.5f; checkpoints in %s",
            self.trainer.run_id,
            self.trainer.best_val_loss,
            self.trainer.run_dir / "checkpoints",
        )
        self._maybe_cache_benchmark()

    def _maybe_cache_benchmark(self) -> None:
        """Post-training cached-vs-uncached timing on the fresh model
        (reference cmd/conf/train_with_cache_benchmark.yaml flow)."""
        cb = self.cfg.get("cache_benchmark") or {}
        if not cb:
            return
        import json
        import time

        from fdtpu.sampling import DiffusionSampler

        num_samples = int(cb.get("num_samples", 5))
        steps = int(cb.get("num_diffusion_steps", 5))
        batch = int(cb.get("sample_batch_size", num_samples))
        results = {}
        for name, kwargs in (
            ("uncached", dict()),
            (
                "cached",
                dict(
                    use_cache=True,
                    cache_kwargs=dict(cb.get("cache_kwargs") or {}),
                    use_fresca=bool(cb.get("use_fresca", False)),
                    **(cb.get("fresca_kwargs") or {}),
                ),
            ),
        ):
            sampler = DiffusionSampler(self.model, sample_batch_size=batch, **kwargs)
            sampler.sample(num_samples, steps, key=jax.random.PRNGKey(0))  # compile
            sampler.last_cache_state = None
            t0 = time.time()
            sampler.sample(num_samples, steps, key=jax.random.PRNGKey(1))
            results[name] = {"time_s": time.time() - t0}
            if kwargs.get("use_cache"):
                results[name]["cache_stats"] = sampler.get_cache_stats()
        results["speedup"] = results["uncached"]["time_s"] / results["cached"]["time_s"]
        out = self.trainer.run_dir / "cache_benchmark.json"
        out.write_text(json.dumps(results, indent=2))
        logging.info(
            "cache benchmark: %.2fx speedup (results in %s)",
            results["speedup"], out,
        )


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s", force=True)
    argv = sys.argv[1:]
    config_name = "train"
    filtered = []
    i = 0
    while i < len(argv):
        if argv[i] == "--config-name" and i + 1 < len(argv):
            config_name = argv[i + 1]
            i += 2
        elif argv[i].startswith("--config-name="):
            config_name = argv[i].split("=", 1)[1]
            i += 1
        else:
            filtered.append(argv[i])
            i += 1
    cfg = compose_config(CONFIG_DIR, config_name, filtered)
    from fdtpu.utils.wandb import maybe_initialize_wandb

    run_id = maybe_initialize_wandb(cfg)
    if run_id:
        cfg["run_id"] = run_id
    runner = TrainingRunner(cfg)
    runner.train()


if __name__ == "__main__":
    main()
