#!/usr/bin/env python
"""Per-span guard telemetry for the headline protocol (VERDICT r3 item #1).

Replays bench.py's cached headline leg (trained flagship, T=1000, 4 batches
of 128, key PRNGKey(1)) through the host-loop `sample_chain` with
``guard_trace=True`` and dumps every guard measurement — the step it landed
on, the realized relative extrapolation error, the ε̂-norm denominator, the
predicted budget and the span length — plus the ε̂-norm profile over ALL
full steps.  Purpose: localize WHERE the worst-span spike that fired the
guard in BENCH_r03.json (worst 20.5 vs calibrated 3.1) comes from, and test
the end-of-trajectory denominator-shrinkage hypothesis offline.

Usage:
    python scripts/diagnose_guard.py --out /tmp/guard_trace.json
    FDTPU_PLATFORM=cpu python scripts/diagnose_guard.py --quick  # plumbing
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/fdtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--batches", type=int, default=4)
    parser.add_argument("--tau0", type=float, default=None)
    parser.add_argument("--seed", type=int, default=1, help="sampling PRNG key")
    parser.add_argument("--out", type=str, default="/tmp/guard_trace.json")
    args = parser.parse_args()

    from bench import CACHE_KWARGS, build_model

    from fdtpu.cache.e2crf import cache_stats
    from fdtpu.sampling import DiffusionSampler
    from fdtpu.sampling.sampler import _prep_cache_for_new_batch, sample_chain

    steps = args.steps or (100 if args.quick else 1000)
    batch = args.batch or (16 if args.quick else 128)
    cache_kwargs = dict(CACHE_KWARGS)
    if args.tau0 is not None:
        cache_kwargs["tau_0"] = args.tau0

    model = build_model(max_len=187, trained=not args.quick, epochs=args.epochs)
    sampler = DiffusionSampler(
        model, batch, use_cache=True, cache_kwargs=cache_kwargs
    )

    key = jax.random.PRNGKey(args.seed)
    state = None
    measurements = []
    full_step_profile = []
    for b in range(args.batches):
        key, k_prior, k_chain = jax.random.split(key, 3)
        x0 = sampler.sample_prior(k_prior, batch)
        if state is None:
            state = sampler._init_cache(batch)
        else:
            state = _prep_cache_for_new_batch(state, None, reset=False)
        x, state, trace = sample_chain(
            model.variables,
            model.scheduler,
            x0,
            k_chain,
            state,
            model_cfg=model.config,
            cache_cfg=sampler.cache_config,
            num_steps=steps,
            guard_trace=True,
        )
        assert np.isfinite(np.asarray(x)).all()
        measured, rel, eps_norm, err_acc, steps_since = (
            np.asarray(a, dtype=np.float64) for a in trace
        )
        # eps_norm > 0 marks every FULL step (skip steps emit zeros).
        for i in np.nonzero(eps_norm > 0)[0]:
            full_step_profile.append(
                {"batch": b, "step": int(i), "eps_norm": float(eps_norm[i])}
            )
        for i in np.nonzero(measured > 0)[0]:
            measurements.append(
                {
                    "batch": b,
                    "step": int(i),
                    "rel": float(rel[i]),
                    "eps_norm": float(eps_norm[i]),
                    "err_acc": float(err_acc[i]),
                    "steps_since": float(steps_since[i]),
                }
            )

    sampler.last_cache_state = state
    stats = cache_stats(state)
    worst = max((m["rel"] for m in measurements), default=0.0)
    worst_m = max(measurements, key=lambda m: m["rel"], default=None)
    out = {
        "protocol": {
            "steps": steps,
            "batch": batch,
            "batches": args.batches,
            "cache_kwargs": cache_kwargs,
            "sample_key": args.seed,
            "trained": not args.quick,
            "epochs": args.epochs,
        },
        "guard_stats": {
            k: stats[k]
            for k in (
                "guard_measurements",
                "realized_err_mean",
                "predicted_err_mean",
                "realized_err_max",
                "budget_overrun_ratio",
                "steps_skipped_ratio",
            )
        },
        "worst_measurement": worst_m,
        "measurements": measurements,
        "full_step_eps_norm_profile": full_step_profile,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(
        f"# {len(measurements)} guard measurements, worst rel {worst:.3f} "
        f"(stats realized_err_max {stats['realized_err_max']:.3f}, "
        f"mean {stats['realized_err_mean']:.3f}) -> {args.out}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
