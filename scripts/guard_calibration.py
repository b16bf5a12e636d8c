#!/usr/bin/env python
"""Guard-rail validation on trained flagships.

v1 (VERDICT round-2 ask #3, default mode): trains the bench flagship once
(synthetic-freq, 25 epochs), sweeps the documented safe and collapsing
operating points from the τ₀ frontier (docs/benchmarks/README.md: floor
crossing between τ₀=2 and 5; pure periodic R≥20 collapses) and records, per
arm: realized SW deviation vs the uncached run, the guard telemetry, and
whether the runtime guard flagged it.  Writes docs/benchmarks/guard_demo.json.

v2 (VERDICT round-3 ask #7, ``--v2``): the same confusion matrix over ≥3
INDEPENDENTLY TRAINED flagships (different init+training seeds) × T ∈
{500, 1000}, so the mean/max thresholds carry across-retrain error bars.
Writes docs/benchmarks/guard_demo_v2.json with per-run arms and a per-arm
spread summary.

Usage:
  python scripts/guard_calibration.py [--epochs 25] [--steps 500]
  python scripts/guard_calibration.py --v2 --train-seeds 42,43,44 \
      --steps-list 500,1000
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
    # Probed variants: random probes (same token_budget — free) audit
    # stale tokens, and the TOPK guard measurement records what the audit
    # finds.  Without probes the token-level cumulative-bias collapse is
    # structurally invisible to per-span telemetry (every statistic of the
    # unprobed τ₀=3 arm sits in the safe range at SW 50× floor).
    (
        "token_tau3_b24_probed",
        {"level": "token", "token_budget": 24, "R": 100, "tau_0": 3.0,
         "random_probe_ratio": 0.05},
        "collapse",
    ),
    (
        "token_tau0.5_b24_probed",
        {"level": "token", "token_budget": 24, "R": 100, "tau_0": 0.5,
         "random_probe_ratio": 0.05},
        "safe",
    ),
    (
        "auto_calibrate_tau5",
        {"level": "score", "R": 20, "tau_0": 5.0, "auto_calibrate": True},
        "rescued",
    ),
    # The SHIPPED headline operating point (bench.py CACHE_KWARGS) — its
    # across-retrain/across-T spread is what the guard thresholds must
    # clear with margin (VERDICT r3 weakness #1).
    ("headline_tau1.2_R100", {"level": "score", "R": 100, "tau_0": 1.2}, "safe"),
]


def run_suite(model, batch: int, steps: int, arms, sw_floor_samples=None):
    """Sweep ``arms`` on one trained model at one T; returns
    (floor, arms_payload)."""
    from fdtpu.metrics import SlicedWasserstein
    from fdtpu.sampling import DiffusionSampler

    uncached = DiffusionSampler(model, sample_batch_size=batch)
    s_base = uncached.sample(batch, steps, key=jax.random.PRNGKey(1))
    s_base2 = uncached.sample(batch, steps, key=jax.random.PRNGKey(99))
    sw = SlicedWasserstein(
        original_samples=s_base, random_seed=42, num_directions=200
    )
    floor = float(sw(s_base2)["sliced_wasserstein_mean"])

    payload = {}
    for name, kwargs, expected in arms:
        sampler = DiffusionSampler(
            model, sample_batch_size=batch, use_cache=True,
            cache_kwargs=dict(kwargs),
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            s = sampler.sample(batch, steps, key=jax.random.PRNGKey(1))
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
            "eps_norm_peak": stats["eps_norm_peak"],
            "eps_norm_scale": stats["eps_norm_scale"],
            "eps_norm_growth": stats["eps_norm_growth"],
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
                model, sample_batch_size=batch, use_cache=True,
                cache_kwargs=dict(kwargs),
            ).sample(2 * batch, steps, key=jax.random.PRNGKey(2))
            entry["second_batch"] = {
                "sw_first_batch": float(
                    sw(s2[:batch])["sliced_wasserstein_mean"]
                ),
                "sw_vs_uncached": float(
                    sw(s2[batch:])["sliced_wasserstein_mean"]
                ),
            }
        payload[name] = entry
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
    return floor, payload


def confusion_summary(arms: dict, floor: float) -> dict:
    """Detector confusion vs MEASURED quality on this model.

    The static ``expected`` labels came from the seed-42 frontier; model
    quality varies ~4× across training seeds (the SW floor is 1.0 on seed
    42 vs 3.3–4.0 on seeds 43/44), so an arm that collapses one model can
    be within another's noise floor.  Ground truth here is each run's own
    floor: bad = SW > 2×floor (must flag), good = SW ≤ 1.5×floor (must
    stay silent), in between is borderline either way."""
    bad = {k: a for k, a in arms.items() if a["sw_vs_uncached"] > 2 * floor}
    good = {
        k: a for k, a in arms.items() if a["sw_vs_uncached"] <= 1.5 * floor
    }
    return {
        "bad_missed": [k for k, a in bad.items() if not a["guard_flagged"]],
        "false_alarms": [k for k, a in good.items() if a["guard_flagged"]],
        "borderline": [k for k in arms if k not in bad and k not in good],
        "bad_caught": all(a["guard_flagged"] for a in bad.values()),
        "safe_clean": all(not a["guard_flagged"] for a in good.values()),
        "auto_calibrate_rescued_second_batch": (
            arms["auto_calibrate_tau5"]["second_batch"]["sw_vs_uncached"]
            < 0.5 * arms["score_tau5_R20"]["sw_vs_uncached"]
            if "auto_calibrate_tau5" in arms
            and "score_tau5_R20" in arms
            and arms["score_tau5_R20"]["sw_vs_uncached"] > 2 * floor
            else None
        ),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--arms", type=str, default=None,
                        help="comma-separated arm names to (re)run")
    parser.add_argument("--v2", action="store_true",
                        help="across-retrain × across-T calibration sweep")
    parser.add_argument("--train-seeds", type=str, default="42,43,44")
    parser.add_argument("--steps-list", type=str, default="500,1000")
    args = parser.parse_args()

    import bench

    arms = ARMS
    if args.arms:
        wanted = set(args.arms.split(","))
        arms = [a for a in ARMS if a[0] in wanted]

    if args.v2:
        seeds = [int(s) for s in args.train_seeds.split(",")]
        steps_list = [int(s) for s in args.steps_list.split(",")]
        out = REPO / "docs" / "benchmarks" / "guard_demo_v2.json"
        payload = {
            "config": {"epochs": args.epochs, "batch": args.batch,
                       "train_seeds": seeds, "steps_list": steps_list},
            "runs": json.loads(out.read_text()).get("runs", {}) if out.exists() else {},
        }
        for seed in seeds:
            model = bench.build_model(
                max_len=187, trained=True, epochs=args.epochs, seed=seed
            )
            for steps in steps_list:
                key = f"seed{seed}_T{steps}"
                print(f"=== {key} ===", file=sys.stderr)
                floor, run_arms = run_suite(model, args.batch, steps, arms)
                # Merge with any existing arms for this run (subset reruns
                # via --arms must not clobber the full sweep's entries).
                merged = {
                    **payload["runs"].get(key, {}).get("arms", {}),
                    **run_arms,
                }
                payload["runs"][key] = {
                    "sw_noise_floor": floor, "arms": merged,
                    "summary": confusion_summary(merged, floor),
                }
                out.write_text(json.dumps(payload, indent=2))
        # Per-arm spread across runs: the error bars the thresholds must
        # clear (safe arms' max stays below guard_max_tol with margin;
        # collapse/degraded arms' min stays above some threshold).
        spread: dict[str, dict] = {}
        expected_by_name = {name: exp for name, _, exp in ARMS}
        all_names = sorted(
            {n for r in payload["runs"].values() for n in r["arms"]}
        )
        for name in all_names:
            expected = expected_by_name.get(name, "?")
            vals = [
                r["arms"][name] for r in payload["runs"].values()
                if name in r["arms"]
            ]
            if not vals:
                continue
            spread[name] = {
                "expected": expected,
                "n_runs": len(vals),
                "realized_err_mean_range": [
                    min(v["realized_err_mean"] for v in vals),
                    max(v["realized_err_mean"] for v in vals),
                ],
                "realized_err_max_range": [
                    min(v["realized_err_max"] for v in vals),
                    max(v["realized_err_max"] for v in vals),
                ],
                "flagged": [v["guard_flagged"] for v in vals],
                "sw_vs_uncached_range": [
                    min(v["sw_vs_uncached"] for v in vals),
                    max(v["sw_vs_uncached"] for v in vals),
                ],
            }
        payload["per_arm_spread"] = spread
        payload["summary"] = {
            "all_runs_bad_caught": all(
                r["summary"]["bad_caught"] for r in payload["runs"].values()
            ),
            "all_runs_safe_clean": all(
                r["summary"]["safe_clean"] for r in payload["runs"].values()
            ),
        }
        out.write_text(json.dumps(payload, indent=2))
        print(json.dumps(payload["summary"]))
        return

    model = bench.build_model(max_len=187, trained=True, epochs=args.epochs)
    out = REPO / "docs" / "benchmarks" / "guard_demo.json"
    existing = {}
    if args.arms and out.exists():
        # Subset rerun: keep the other arms' existing entries.
        existing = json.loads(out.read_text()).get("arms", {})
    floor, run_arms = run_suite(model, args.batch, args.steps, arms)
    payload = {
        "config": {"epochs": args.epochs, "steps": args.steps,
                   "batch": args.batch, "sw_noise_floor": floor},
        "arms": {**existing, **run_arms},
    }
    payload["summary"] = confusion_summary(payload["arms"], floor)
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload["summary"]))


if __name__ == "__main__":
    main()
