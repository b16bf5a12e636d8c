#!/usr/bin/env python
"""Token-level E²-CRF timing sweep on the real TPU chip.

Measures the flagship (187 tokens × 1 channel, d_model=72, L=10, H=12) at
batch 128 / T=1000 (the VERDICT round-1 done-criterion operating point):

* uncached baseline
* level="token" with τ₀=0 (skip tier disabled — the pure per-token
  mechanism, directly comparable to the reference's KV-level claims)
  across a budget sweep
* level="token" with the skip tier enabled (the full three-tier policy)
* level="kv" event policy (round-1 mechanism, for the before/after record)

Usage:  python scripts/bench_token_level.py [--trained] [--steps N] [--batch N]

Writes a JSON summary to docs/benchmarks/token_level_timings.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/fdtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np


def measure(sampler, num_samples, steps, key, min_total_s=15.0, max_repeats=12):
    out = sampler.sample(num_samples, steps, key=key)  # warmup/compile
    times = []
    while (len(times) < 3) or (sum(times) < min_total_s and len(times) < max_repeats):
        sampler.last_cache_state = None
        t0 = time.time()
        out = sampler.sample(num_samples, steps, key=key)
        times.append(time.time() - t0)
    assert np.isfinite(out).all()
    return float(np.median(times))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--trained", action="store_true")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--budgets", type=int, nargs="*", default=[24, 48, 96])
    parser.add_argument("--model-id", type=str, default=None,
                        help="benchmark an existing trained run instead of training fresh")
    args = parser.parse_args()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    from fdtpu.metrics import SlicedWasserstein
    from fdtpu.sampling import DiffusionSampler

    if args.model_id:
        from fdtpu.train import get_best_checkpoint, load_checkpoint

        ckpt = get_best_checkpoint(
            Path(__file__).resolve().parent.parent
            / "lightning_logs" / args.model_id / "checkpoints"
        )
        model = load_checkpoint(ckpt, attention_impl="auto")
        args.trained = True
    else:
        model = bench.build_model(187, trained=args.trained, epochs=args.epochs)
    batch, steps = args.batch, args.steps

    results: dict[str, dict] = {}

    uncached = DiffusionSampler(model, sample_batch_size=batch)
    t_un = measure(uncached, batch, steps, jax.random.PRNGKey(1))
    results["uncached"] = {"time_s": t_un, "speedup": 1.0}
    print(f"uncached: {t_un:.2f}s", file=sys.stderr)

    # Quality yardstick (trained models only): SW distance of each cached
    # run to the uncached samples, vs the two-independent-uncached-runs
    # noise floor (same protocol as bench.py).
    sw = floor = None
    if args.trained:
        s_base = uncached.sample(batch, steps, key=jax.random.PRNGKey(1))
        s_base2 = uncached.sample(batch, steps, key=jax.random.PRNGKey(99))
        sw = SlicedWasserstein(
            original_samples=s_base, random_seed=42, num_directions=200
        )
        floor = float(sw(s_base2)["sliced_wasserstein_mean"])
        results["uncached"]["sw_noise_floor"] = floor
        print(f"noise floor SW: {floor:.3f}", file=sys.stderr)

    def run(name, kwargs):
        s = DiffusionSampler(
            model, sample_batch_size=batch, use_cache=True, cache_kwargs=kwargs
        )
        t = measure(s, batch, steps, jax.random.PRNGKey(1))
        stats = s.get_cache_stats()
        results[name] = {
            "time_s": t,
            "speedup": t_un / t,
            "cache_kwargs": kwargs,
            "full_steps": stats.get("full_steps"),
            "topk_steps": stats.get("mixed_steps"),
            "skip_steps": stats.get("cached_steps"),
            "cache_hit_ratio": stats.get("cache_hit_ratio"),
        }
        if sw is not None:
            s.last_cache_state = None
            samples = s.sample(batch, steps, key=jax.random.PRNGKey(1))
            results[name]["sw_vs_uncached"] = float(
                sw(samples)["sliced_wasserstein_mean"]
            )
        print(
            f"{name}: {t:.2f}s  speedup {t_un / t:.2f}x  "
            f"(full {stats.get('full_steps')}, topk {stats.get('mixed_steps')}, "
            f"skip {stats.get('cached_steps')})"
            + (
                f"  SW {results[name]['sw_vs_uncached']:.3f} (floor {floor:.3f})"
                if sw is not None
                else ""
            ),
            file=sys.stderr,
        )

    for budget in args.budgets:
        run(
            f"token_b{budget}_noskip",
            {"level": "token", "token_budget": budget, "tau_0": 0.0, "R": 100},
        )
    run(
        "token_b48_skip",
        {"level": "token", "token_budget": 48, "tau_0": 1.0, "R": 100},
    )
    run(
        "token_b24_skip",
        {"level": "token", "token_budget": 24, "tau_0": 0.5, "R": 100},
    )
    # Hybrid operating points: the state-derived budget lets TOPK steps
    # drain the error estimate, so long skip stretches need only cheap
    # token refreshes — full passes only every R=250 as a safety net.
    for tau in (0.3, 1.0, 3.0):
        run(
            f"hybrid_b24_tau{tau:g}",
            {"level": "token", "token_budget": 24, "tau_0": tau, "R": 250},
        )
    run("kv_event", {"level": "kv", "policy": "event", "K": 5, "R": 100})
    run("score_level", {"level": "score", "R": 100, "tau_0": 1.0, "eps_order": 1})

    stem = (
        f"token_level_timings@{args.model_id}"
        if args.model_id
        else "token_level_timings"
    )
    out = Path(__file__).resolve().parent.parent / f"docs/benchmarks/{stem}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "config": {
            "batch": batch,
            "steps": steps,
            "trained": args.trained,
            "max_len": 187,
            "model": args.model_id or "flagship d72/L10/H12",
        },
        "results": results,
    }
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
