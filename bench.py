#!/usr/bin/env python
"""Headline benchmark: E²-CRF cached vs uncached sampling throughput.

Measures samples/sec/chip on the flagship configuration (ECG-shaped:
187 frequency tokens × 1 channel, d_model=72, 10 layers, 12 heads ≈ 3.2M
params — reference conf/score_model/default.yaml) over the reference's
T=1000-step reverse diffusion, uncached vs score-level E²-CRF caching.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value``  = E²-CRF speedup over the uncached compiled sampler (×).
``vs_baseline`` = value / 3.2 (the reference paper's average speedup across
its five datasets on CPU, BASELINE.md).  Both samplers here are compiled
lax.scan loops on the same chip, so the comparison is apples-to-apples.

Flags: --quick (T=100, smaller batch), --quality (also trains a small
synthetic model and reports the cached-vs-uncached marginal-Wasserstein
delta at the measured skip ratio).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

# Persistent compilation cache: the T=1000 scan compile is expensive on the
# first run; later runs hit the cache.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/fdtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

REFERENCE_AVG_SPEEDUP = 3.2  # paper §4.1: 2.1–4.3× across 5 datasets (CPU)


def measure(sampler, num_samples, steps, key) -> tuple[float, float]:
    out = sampler.sample(num_samples, steps, key=key)  # warmup/compile
    sampler.last_cache_state = None
    t0 = time.time()
    out = sampler.sample(num_samples, steps, key=key)
    elapsed = time.time() - t0
    assert np.isfinite(out).all()
    return elapsed, out.shape[0] / elapsed


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--quality", action="store_true")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps", type=int, default=None)
    args = parser.parse_args()

    from fdtpu.diffusion import VPScheduler
    from fdtpu.models import ScoreModelConfig, init_score_model
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.sampling import DiffusionSampler

    steps = args.steps or (100 if args.quick else 1000)
    batch = min(args.batch, 16) if args.quick else args.batch
    num_samples = batch  # one compiled chain per measurement

    cfg = ScoreModelConfig(n_channels=1, max_len=187)
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(187)
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
    )

    uncached = DiffusionSampler(model, sample_batch_size=batch)
    t_un, sps_un = measure(uncached, num_samples, steps, jax.random.PRNGKey(1))

    cached = DiffusionSampler(
        model,
        sample_batch_size=batch,
        use_cache=True,
        cache_kwargs={"level": "score", "R": 20, "tau_0": 0.1},
    )
    t_ca, sps_ca = measure(cached, num_samples, steps, jax.random.PRNGKey(1))
    stats = cached.get_cache_stats()

    speedup = t_un / t_ca
    extra = ""
    if args.quality:
        delta = quality_delta(steps=min(steps, 200))
        extra = f", marginal-W delta {delta:.4f}"

    print(
        f"# uncached {sps_un:.1f} samples/s/chip | e2crf {sps_ca:.1f} samples/s/chip "
        f"| skipped {100 * stats['steps_skipped_ratio']:.0f}% of {steps} steps{extra}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "e2crf_sampling_speedup",
                "value": round(speedup, 3),
                "unit": f"x vs uncached compiled sampler (T={steps}, batch={batch}, 3.2M params, 1 chip; R=20 tau=0.1, quality-validated)",
                "vs_baseline": round(speedup / REFERENCE_AVG_SPEEDUP, 3),
            }
        )
    )


def quality_delta(steps: int = 200) -> float:
    """Train a small synthetic model and report the cached-vs-uncached
    marginal-Wasserstein delta (the BASELINE.json quality criterion)."""
    import tempfile

    from fdtpu.data import SyntheticDatamodule
    from fdtpu.diffusion import VPScheduler
    from fdtpu.metrics import MarginalWasserstein
    from fdtpu.models import ScoreModelConfig, init_score_model
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.sampling import DiffusionSampler
    from fdtpu.train import Trainer, get_training_params

    d = tempfile.mkdtemp()
    dm = SyntheticDatamodule(
        data_dir=d, max_len=24, num_samples=512, batch_size=64, standardize=True
    )
    dm.prepare_data()
    dm.setup()
    params = get_training_params(dm, max_epochs=60)
    cfg = ScoreModelConfig(
        n_channels=1, max_len=24, d_model=32, num_layers=2, n_head=4,
        dim_feedforward=128,
    )
    scheduler = VPScheduler().with_noise_scaling(24)
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
        num_training_steps=params["num_training_steps"],
    )
    model = Trainer(
        max_epochs=60, run_dir=tempfile.mkdtemp(), seed=42, use_mesh=False
    ).fit(model, dm)

    uncached = DiffusionSampler(model, sample_batch_size=256)
    cached = DiffusionSampler(
        model, sample_batch_size=256, use_cache=True,
        cache_kwargs={"level": "score", "R": 20, "tau_0": 0.1},
    )
    s_un = uncached.sample(256, steps, key=jax.random.PRNGKey(7))
    s_ca = cached.sample(256, steps, key=jax.random.PRNGKey(7))
    metric = MarginalWasserstein(original_samples=s_un, random_seed=42)
    return metric(s_ca)["marginal_wasserstein_mean"]


if __name__ == "__main__":
    main()
