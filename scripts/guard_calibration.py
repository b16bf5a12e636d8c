#!/usr/bin/env python
"""Guard-rail validation on a trained flagship (VERDICT round-2 ask #3).

Trains the bench flagship once (synthetic-freq, 25 epochs), then sweeps
the documented safe and collapsing operating points from the τ₀ frontier
(docs/benchmarks/README.md: floor crossing between τ₀=2 and 5; pure
periodic R≥20 collapses) and records, per arm: realized SW deviation vs
the uncached run, the guard telemetry, and whether the runtime guard
flagged it.  Writes docs/benchmarks/guard_demo.json.

Done criterion from the verdict: the collapse arms (score τ₀≥5, periodic
R≥20; token-level τ₀=3 analog) are caught at runtime; the quality-safe
arms are not.

Usage: python scripts/guard_calibration.py [--epochs 25] [--steps 500]
"""

from __future__ import annotations

import argparse
import json
import sys
import warnings
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/fdtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

ARMS = [
    # name, cache_kwargs, expected ("safe" | "collapse") from the frontier
    ("score_tau0.5_R20", {"level": "score", "R": 20, "tau_0": 0.5}, "safe"),
    ("score_tau1_R20", {"level": "score", "R": 20, "tau_0": 1.0}, "safe"),
    # τ₀=2 measured SW 2.9 vs floor 1.19 on the calibration run — a real
    # (2.4× floor) degradation at this resolution, so a flag is correct.
    ("score_tau2_R20", {"level": "score", "R": 20, "tau_0": 2.0}, "degraded"),
    ("score_tau5_R20", {"level": "score", "R": 20, "tau_0": 5.0}, "collapse"),
    ("periodic_R20", {"level": "score", "R": 20, "tau_0": 1e9}, "collapse"),
    ("periodic_R50", {"level": "score", "R": 50, "tau_0": 1e9}, "collapse"),
    (
        "token_tau3_b24",
        {"level": "token", "token_budget": 24, "R": 100, "tau_0": 3.0},
        "collapse",
    ),
    (
        "token_tau0.5_b24",
        {"level": "token", "token_budget": 24, "R": 100, "tau_0": 0.5},
        "safe",
    ),
    (
        "auto_calibrate_tau5",
        {"level": "score", "R": 20, "tau_0": 5.0, "auto_calibrate": True},
        "rescued",
    ),
]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--arms", type=str, default=None,
                        help="comma-separated arm names to (re)run")
    args = parser.parse_args()

    import bench

    from fdtpu.metrics import SlicedWasserstein
    from fdtpu.sampling import DiffusionSampler

    model = bench.build_model(max_len=187, trained=True, epochs=args.epochs)

    uncached = DiffusionSampler(model, sample_batch_size=args.batch)
    s_base = uncached.sample(args.batch, args.steps, key=jax.random.PRNGKey(1))
    s_base2 = uncached.sample(args.batch, args.steps, key=jax.random.PRNGKey(99))
    sw = SlicedWasserstein(
        original_samples=s_base, random_seed=42, num_directions=200
    )
    floor = float(sw(s_base2)["sliced_wasserstein_mean"])

    out = REPO / "docs" / "benchmarks" / "guard_demo.json"
    payload = {
        "config": {"epochs": args.epochs, "steps": args.steps,
                   "batch": args.batch, "sw_noise_floor": floor},
        "arms": {},
    }
    if args.arms and out.exists():
        # Subset rerun: keep the other arms' existing entries.
        payload["arms"] = json.loads(out.read_text()).get("arms", {})
    arms = ARMS
    if args.arms:
        wanted = set(args.arms.split(","))
        arms = [a for a in ARMS if a[0] in wanted]
    for name, kwargs, expected in arms:
        sampler = DiffusionSampler(
            model, sample_batch_size=args.batch, use_cache=True,
            cache_kwargs=dict(kwargs),
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            s = sampler.sample(args.batch, args.steps, key=jax.random.PRNGKey(1))
        flagged = any("error-budget guard" in str(w.message) for w in caught)
        stats = sampler.get_cache_stats()
        sw_dev = float(sw(s)["sliced_wasserstein_mean"])
        entry = {
            "expected": expected,
            "guard_flagged": flagged,
            "sw_vs_uncached": sw_dev,
            "sw_collapsed": sw_dev > 3 * floor,
            "steps_skipped_ratio": stats["steps_skipped_ratio"],
            "realized_err_mean": stats["realized_err_mean"],
            "realized_err_max": stats["realized_err_max"],
            "predicted_err_mean": stats["predicted_err_mean"],
            "budget_overrun_ratio": stats["budget_overrun_ratio"],
            "overrun_mark": stats["overrun_mark"],
            "guard_measurements": stats["guard_measurements"],
            "full_steps": stats["full_steps"],
        }
        if kwargs.get("auto_calibrate"):
            # Auto-calibration's rescue semantics are CROSS-BATCH: the
            # collapse signature (the worst span) appears at the END of a
            # trajectory, and the cache — including the overrun mark —
            # persists across the batches of one sample() call (quirk Q5),
            # so the second batch starts with a tightened budget.  Sample
            # two batches in one call and score each half.
            s2 = DiffusionSampler(
                model, sample_batch_size=args.batch, use_cache=True,
                cache_kwargs=dict(kwargs),
            ).sample(2 * args.batch, args.steps, key=jax.random.PRNGKey(2))
            entry["second_batch"] = {
                "sw_first_batch": float(
                    sw(s2[: args.batch])["sliced_wasserstein_mean"]
                ),
                "sw_vs_uncached": float(
                    sw(s2[args.batch:])["sliced_wasserstein_mean"]
                ),
            }
        payload["arms"][name] = entry
        print(
            f"{name:<22} expect={expected:<9} flagged={flagged!s:<5} "
            f"SW {sw_dev:8.2f} (floor {floor:.2f})  realized "
            f"{entry['realized_err_mean']:.3f}/{entry['realized_err_max']:.3f} "
            f"overrun {entry['budget_overrun_ratio']:.2f} "
            f"skip {100 * entry['steps_skipped_ratio']:.0f}%"
            + (
                f"  | 2nd batch SW {entry['second_batch']['sw_vs_uncached']:.2f}"
                if "second_batch" in entry
                else ""
            ),
            file=sys.stderr,
        )
        out.write_text(json.dumps(payload, indent=2))

    # Detector confusion summary ("degraded" and "collapse" should flag).
    arms = payload["arms"]
    payload["summary"] = {
        "collapse_caught": all(
            a["guard_flagged"] for a in arms.values()
            if a["expected"] in ("collapse", "degraded")
        ),
        "safe_clean": all(
            not a["guard_flagged"] for a in arms.values()
            if a["expected"] == "safe" and not a["sw_collapsed"]
        ),
        "auto_calibrate_rescued_second_batch": (
            arms["auto_calibrate_tau5"]["second_batch"]["sw_vs_uncached"]
            < 0.5 * arms["score_tau5_R20"]["sw_vs_uncached"]
            if "auto_calibrate_tau5" in arms
            and "score_tau5_R20" in arms
            else None
        ),
    }
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload["summary"]))


if __name__ == "__main__":
    main()
