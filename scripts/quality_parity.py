#!/usr/bin/env python
"""Head-to-head quality parity: fdtpu vs a torch replica of the reference,
trained on IDENTICAL data with matched hyperparameters.

Exercises the BASELINE.json gate ("match reference sample quality within
1e-3 marginal-Wasserstein delta"): both stacks train on the same
standardized frequency-domain arrays (the synthetic DGP, and optionally an
ECG-shaped 187-token variant), sample with the same step count, and are
compared on marginal/sliced Wasserstein distance to the same held-out test
set.  The torch side rebuilds the reference semantics from torch primitives
(fdtpu/utils/torch_replica.py, reference score_models.py:54-113,
losses.py:39-125, sde.py:168-246, sampler.py:105-228).

Outputs docs/benchmarks/quality_parity.json + .md.

Usage: python scripts/quality_parity.py [--epochs 25] [--steps 500]
       [--num-samples 512] [--max-len 100] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("FDTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/fdtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np


def destandardize_and_idft(x_freq_std, mean, std):
    from fdtpu.ops import idft

    x = x_freq_std * std + mean
    return np.asarray(idft(x))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--num-samples", type=int, default=512)
    parser.add_argument("--max-len", type=int, default=100)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    if args.quick:
        args.epochs, args.steps, args.num_samples = 2, 50, 64

    from fdtpu.data import SyntheticDatamodule
    from fdtpu.diffusion import VPScheduler
    from fdtpu.metrics import MarginalWasserstein, SlicedWasserstein
    from fdtpu.models import ScoreModelConfig, init_score_model
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.sampling import DiffusionSampler
    from fdtpu.train import Trainer, get_training_params
    from fdtpu.utils.torch_replica import build_torch_score_net, torch_sample, torch_train

    max_len = args.max_len

    # ---------------- shared data: synthetic DGP → dft → standardize
    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=max_len, num_samples=2000,
        batch_size=64, fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    # The exact standardized freq-domain arrays both stacks train on.
    x_std = dm.train_dataloader().dataset.standardized().astype(np.float32)
    feat_mean, feat_std = dm.feature_mean_and_std
    feat_mean, feat_std = np.asarray(feat_mean), np.asarray(feat_std)

    # Held-out yardstick in the TIME domain.
    x_test_time = destandardize_and_idft(
        dm.test_dataloader().dataset.standardized(), feat_mean, feat_std
    )

    # ---------------- fdtpu stack
    attention_impl = (
        "blockdiag" if jax.default_backend() not in ("cpu",) else "einsum"
    )
    cfg = ScoreModelConfig(n_channels=1, max_len=max_len, attention_impl=attention_impl)
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(max_len)
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
    )
    model.num_training_steps = get_training_params(dm, max_epochs=args.epochs)[
        "num_training_steps"
    ]
    t0 = time.time()
    trainer = Trainer(
        max_epochs=args.epochs, run_dir=tempfile.mkdtemp(), seed=42,
        log_every_n_steps=10_000,
    )
    model = trainer.fit(model, dm)
    fdtpu_train_s = time.time() - t0
    print(f"fdtpu trained: {fdtpu_train_s:.0f}s, val/loss {trainer.best_val_loss:.5f}",
          file=sys.stderr)

    sampler = DiffusionSampler(model, sample_batch_size=args.batch)
    t0 = time.time()
    s_fdtpu = sampler.sample(args.num_samples, args.steps, key=jax.random.PRNGKey(7))
    fdtpu_sample_s = time.time() - t0
    s_fdtpu_time = destandardize_and_idft(s_fdtpu, feat_mean, feat_std)

    # Cached variant (bench operating point) for the same gate.
    cached = DiffusionSampler(
        model, sample_batch_size=args.batch, use_cache=True,
        cache_kwargs={"level": "score", "R": 100, "tau_0": 1.0, "eps_order": 1},
    )
    s_cached_time = destandardize_and_idft(
        cached.sample(args.num_samples, args.steps, key=jax.random.PRNGKey(7)),
        feat_mean, feat_std,
    )

    # ---------------- torch replica on the same arrays
    net = build_torch_score_net(
        n_channels=1, max_len=max_len, d_model=cfg.d_model,
        num_layers=cfg.num_layers, n_head=cfg.n_head,
        dim_feedforward=cfg.dim_feedforward, seed=0,
    )
    t0 = time.time()
    losses = torch_train(
        net, x_std, epochs=args.epochs, batch_size=64, lr_max=model.lr_max,
        fourier_scaling=True, seed=42,
    )
    torch_train_s = time.time() - t0
    print(f"torch trained: {torch_train_s:.0f}s, last loss {losses[-1]:.5f}",
          file=sys.stderr)
    t0 = time.time()
    s_torch = torch_sample(
        net, args.num_samples, max_len, 1, args.steps, batch_size=args.batch,
        fourier_scaling=True, seed=7,
    )
    torch_sample_s = time.time() - t0
    s_torch_time = destandardize_and_idft(s_torch, feat_mean, feat_std)

    # ---------------- metrics vs the held-out test set
    mw = MarginalWasserstein(original_samples=x_test_time, random_seed=42)
    sw = SlicedWasserstein(
        original_samples=x_test_time, random_seed=42, num_directions=200
    )

    def level(samples):
        return {
            "mw_mean": float(mw(samples)["marginal_wasserstein_mean"]),
            "sw_mean": float(sw(samples)["sliced_wasserstein_mean"]),
        }

    r_fdtpu = level(s_fdtpu_time)
    r_cached = level(s_cached_time)
    r_torch = level(s_torch_time)
    # Finite-sample noise floor: train split vs test split.
    x_train_time = destandardize_and_idft(x_std, feat_mean, feat_std)
    r_floor = level(x_train_time[: args.num_samples])

    mw_delta = abs(r_fdtpu["mw_mean"] - r_torch["mw_mean"])
    mw_delta_cached = abs(r_cached["mw_mean"] - r_torch["mw_mean"])

    payload = {
        "config": {
            "max_len": max_len, "epochs": args.epochs, "steps": args.steps,
            "num_samples": args.num_samples,
            "model": f"d{cfg.d_model}/L{cfg.num_layers}/H{cfg.n_head}",
        },
        "fdtpu": {**r_fdtpu, "train_s": fdtpu_train_s, "sample_s": fdtpu_sample_s},
        "fdtpu_cached": r_cached,
        "torch_replica": {
            **r_torch, "train_s": torch_train_s, "sample_s": torch_sample_s,
        },
        "data_noise_floor": r_floor,
        "mw_delta_fdtpu_vs_torch": mw_delta,
        "mw_delta_cached_vs_torch": mw_delta_cached,
        "gate_1e-3_direct": mw_delta <= 1e-3,
        "gate_within_floor": mw_delta <= max(1e-3, r_floor["mw_mean"]),
    }
    out = Path(__file__).resolve().parent.parent / "docs/benchmarks/quality_parity.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
