#!/usr/bin/env python
"""Quickstart: train a frequency-domain diffusion model on synthetic data,
sample with and without E²-CRF caching, and compare quality + speed.

The script equivalent of the reference's notebooks/ablation_cache_test.ipynb.

    python examples/quickstart.py            # ~2 min on CPU, faster on TPU
"""

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("FDTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])

from fdtpu.data import DiffusionDataset, SyntheticDatamodule
from fdtpu.diffusion import VPScheduler
from fdtpu.metrics import SlicedWasserstein
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler
from fdtpu.train import Trainer, get_training_params


def main() -> None:
    data_dir = tempfile.mkdtemp()
    dm = SyntheticDatamodule(
        data_dir=data_dir, max_len=24, num_samples=512, batch_size=64,
        standardize=True,
    )
    dm.prepare_data()
    dm.setup()

    max_epochs = 60
    params = get_training_params(dm, max_epochs=max_epochs)
    cfg = ScoreModelConfig(
        n_channels=1, max_len=24, d_model=32, num_layers=2, n_head=4,
        dim_feedforward=128,
    )
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=VPScheduler().with_noise_scaling(24),
        num_training_steps=params["num_training_steps"],
    )
    print(f"Training {model.param_count():,}-param model for {max_epochs} epochs...")
    model = Trainer(max_epochs=max_epochs, run_dir=tempfile.mkdtemp(), seed=42).fit(model, dm)

    train_set = DiffusionDataset(X=dm.X_train, standardize=True)
    metric = SlicedWasserstein(original_samples=dm.X_train, random_seed=42, num_directions=200)

    for name, kwargs in [
        ("uncached", {}),
        ("e2crf", dict(use_cache=True, cache_kwargs={"level": "score", "R": 10, "tau_0": 0.05})),
    ]:
        sampler = DiffusionSampler(model, sample_batch_size=256, **kwargs)
        sampler.sample(256, 200, key=jax.random.PRNGKey(1))  # compile
        sampler.last_cache_state = None
        t0 = time.time()
        x = sampler.sample(256, 200, key=jax.random.PRNGKey(1))
        elapsed = time.time() - t0
        x = x * train_set.feature_std + train_set.feature_mean
        sw = metric(x)["sliced_wasserstein_mean"]
        stats = sampler.get_cache_stats()
        print(
            f"{name:<10} {elapsed:6.2f}s  SW={sw:.4f}"
            + (f"  skipped={stats['steps_skipped_ratio']:.0%}" if stats else "")
        )
    print("baselines:", {k: round(v, 4) for k, v in metric.baseline_metrics.items() if "mean" in k})


if __name__ == "__main__":
    main()
