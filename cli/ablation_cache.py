#!/usr/bin/env python
"""E²-CRF ablation CLI (reference `/root/reference/cmd/ablation_cache.py`).

Runs the six ablation configurations of the paper's Table 3 against a trained
model and writes ``ablation_results/ablation_results.json``:

  baseline            — no caching
  full_e2crf          — event-driven score-level skipping (full method)
  no_event_trigger    — fixed R-periodic schedule only (error budget off)
  no_error_feedback   — skip everything after warmup (no refresh)
  no_energy_weighting — KV event policy without spectral-energy weighting
  naive_caching       — KV macro policy (the reference's live behavior)
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

if os.environ.get("FDTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])

from fdtpu.metrics import SlicedWasserstein
from fdtpu.sampling import DiffusionSampler
from fdtpu.train import get_best_checkpoint, load_checkpoint
from fdtpu.utils.builders import resolve_model_dir
from fdtpu.utils.config import compose_config

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"

ABLATIONS: list[tuple[str, dict]] = [
    ("baseline", {}),
    # Uncached rerun with a different PRNG key: its SW vs the baseline
    # samples is the finite-sample noise floor every other SW column entry
    # should be read against.
    ("baseline_rerun_floor", {"_sample_seed": 4242}),
    # --- score level (full-step skipping; the speed headline)
    ("full_e2crf", dict(use_cache=True, cache_kwargs={"level": "score", "policy": "event", "R": 100, "tau_0": 1.0, "eps_order": 1})),
    ("no_extrapolation", dict(use_cache=True, cache_kwargs={"level": "score", "R": 100, "tau_0": 1.0, "eps_order": 0})),
    ("no_event_trigger", dict(use_cache=True, cache_kwargs={"level": "score", "R": 10, "tau_0": 1e9})),
    ("no_error_feedback", dict(use_cache=True, cache_kwargs={"level": "score", "R": 999999, "tau_0": 1e9})),
    # FreqCa as a LIVE ε̂ predictor (the reference's dormant
    # predict_crf_freqca mechanism, caching.py:561-597, measured as an arm
    # per VERDICT r3 ask #4): frozen low-frequency component + Hermite
    # extrapolation of the high-frequency component over the refresh ring.
    ("freqca_predictor", dict(use_cache=True, cache_kwargs={"level": "score", "R": 100, "tau_0": 1.0, "eps_predictor": "freqca"})),
    ("freqca_predictor_h1", dict(use_cache=True, cache_kwargs={"level": "score", "R": 100, "tau_0": 1.0, "eps_predictor": "freqca", "hermite_order": 1})),
    # --- token level (per-token top-k recompute; the mechanism headline,
    #     docs/benchmarks/token_level.md) — each knob measurably moves
    #     speed and/or quality.
    ("token_full", dict(use_cache=True, cache_kwargs={"level": "token", "token_budget": 24, "tau_0": 0.5, "R": 100})),
    ("token_no_skip", dict(use_cache=True, cache_kwargs={"level": "token", "token_budget": 24, "tau_0": 0.0, "R": 100})),
    ("token_no_energy_weighting", dict(use_cache=True, cache_kwargs={"level": "token", "token_budget": 24, "tau_0": 0.0, "R": 100, "energy_weighting": False})),
    ("token_no_extrapolation", dict(use_cache=True, cache_kwargs={"level": "token", "token_budget": 24, "tau_0": 0.0, "R": 100, "eps_order": 0})),
    ("token_random_probe", dict(use_cache=True, cache_kwargs={"level": "token", "token_budget": 24, "tau_0": 0.0, "R": 100, "random_probe_ratio": 0.05})),
    # --- KV level (reference's masked mechanism, kept for parity)
    ("naive_caching", dict(use_cache=True, cache_kwargs={"level": "kv", "policy": "macro"})),
]

# KV-event τ₀ calibration sweep: find the operating point where the pure
# KV event policy actually reaches CACHED steps (round-1 weakness: the
# default τ₀=0.1 never skipped).  Two structural blockers must be off for a
# CACHED step to be reachable at all: K=0 (the K low-frequency anchors force
# MIXED every step) and τ_warn=∞ (mean CRF drift is unnormalized and
# exceeds the 0.5 default on any trained model).  CRF drift is an
# unnormalized L2 over d_model, so the τ₀ scale is model-dependent —
# sweep log-spaced.
KV_TAU_SWEEP = (1.0, 10.0, 100.0, 1000.0)


def kv_event_arm(tau: float) -> dict:
    return dict(
        use_cache=True,
        cache_kwargs={
            "level": "kv", "policy": "event", "K": 0, "R": 100,
            "tau_0": tau, "tau_warn": 1e9,
        },
    )


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s", force=True)
    cfg = compose_config(CONFIG_DIR, "sample", sys.argv[1:])

    model_dir = resolve_model_dir(cfg["model_path"], cfg["model_id"])
    ckpt = get_best_checkpoint(model_dir / "checkpoints")
    logging.info("Ablating checkpoint %s", ckpt)
    model = load_checkpoint(
        ckpt,
        **({"attention_impl": cfg["attention_impl"]} if cfg.get("attention_impl") else {}),
    )

    num_samples = int(cfg["num_samples"])
    steps = int(cfg["num_diffusion_steps"])
    batch = int(cfg["sampler"]["sample_batch_size"])

    results: dict[str, dict] = {}
    baseline_time = None
    baseline_samples = None
    arms = list(ABLATIONS) + [
        (f"kv_event_tau{tau:g}", kv_event_arm(tau)) for tau in KV_TAU_SWEEP
    ]
    for name, kw in arms:
        kw = dict(kw)
        sample_seed = kw.pop("_sample_seed", 42)
        budget = (kw.get("cache_kwargs") or {}).get("token_budget")
        if budget is not None and budget >= model.max_len:
            logging.info("skipping %s: token_budget %s >= max_len %s", name, budget, model.max_len)
            continue
        sampler = DiffusionSampler(model, sample_batch_size=batch, **kw)
        sampler.sample(min(batch, num_samples), steps, key=jax.random.PRNGKey(0))
        times = []
        for _ in range(3):  # median: tunnel timings vary up to 2x per run
            sampler.last_cache_state = None
            t0 = time.time()
            samples = sampler.sample(num_samples, steps, key=jax.random.PRNGKey(sample_seed))
            times.append(time.time() - t0)
        import numpy as _np
        elapsed = float(_np.median(times))
        entry = {
            "time_s": round(elapsed, 4),
            "samples_per_s": round(samples.shape[0] / elapsed, 2),
        }
        if baseline_time is None:
            baseline_time = elapsed
            baseline_samples = samples
            sw_metric = SlicedWasserstein(
                original_samples=baseline_samples, random_seed=42, num_directions=200
            )
        else:
            entry["speedup"] = round(baseline_time / elapsed, 3)
            entry["sw_vs_baseline"] = sw_metric(samples)["sliced_wasserstein_mean"]
        if kw.get("use_cache"):
            entry["cache_stats"] = sampler.get_cache_stats()
        results[name] = entry
        logging.info("%-22s %s", name, json.dumps(entry))

    out_dir = Path("ablation_results")
    out_dir.mkdir(exist_ok=True)
    with open(out_dir / "ablation_results.json", "w") as f:
        json.dump(results, f, indent=2)
    logging.info("Wrote %s", out_dir / "ablation_results.json")

    # Tidy sweep CSV (paper Tables 3/4 shape).
    import pandas as pd

    rows = []
    for name, entry in results.items():
        stats = entry.get("cache_stats", {})
        rows.append(
            {
                "config": name,
                "time_s": entry["time_s"],
                "speedup": entry.get("speedup", 1.0),
                "sw_vs_baseline": entry.get("sw_vs_baseline"),
                "steps_skipped_ratio": stats.get("steps_skipped_ratio", 0.0),
                "cache_hit_ratio": stats.get("cache_hit_ratio", 0.0),
                "full_steps": stats.get("full_steps"),
                "topk_steps": stats.get("mixed_steps"),
            }
        )
    pd.DataFrame(rows).to_csv(out_dir / "ablation_sweep.csv", index=False)
    logging.info("Wrote %s", out_dir / "ablation_sweep.csv")

    # Summary table (reference ablation_cache.py:221-247).
    print(f"\n{'config':<24}{'time (s)':>10}{'speedup':>10}{'skipped':>10}{'SW':>12}")
    for name, entry in results.items():
        skipped = entry.get("cache_stats", {}).get("steps_skipped_ratio", 0.0)
        print(
            f"{name:<24}{entry['time_s']:>10.3f}{entry.get('speedup', 1.0):>10.2f}"
            f"{skipped:>10.2f}{entry.get('sw_vs_baseline', float('nan')):>12.4f}"
        )


if __name__ == "__main__":
    main()
