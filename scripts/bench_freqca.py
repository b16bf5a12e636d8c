#!/usr/bin/env python
"""FreqCa as a live ε̂ predictor: measure, accept/reject (VERDICT r3 ask #4).

The reference ships ``predict_crf_freqca`` as dead code (quirk Q1); fdtpu
wires the mechanism into the score-level skip path
(``eps_predictor="freqca"``: frozen low-frequency ε̂ component + Hermite
extrapolation of the high-frequency component over a refresh-history ring).
This harness runs it against the shipped taylor order-1 predictor on the
TRAINED flagship at the headline protocol: for each arm — skip ratio,
samples/s/chip, SW vs the uncached run (floor from an independent uncached
key), and the guard telemetry.  Writes docs/benchmarks/freqca_eps.json.
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
    ("taylor_order1", {"eps_order": 1}),
    ("freqca_h3", {"eps_predictor": "freqca", "hermite_order": 3}),
    ("freqca_h2", {"eps_predictor": "freqca", "hermite_order": 2}),
    ("freqca_h1", {"eps_predictor": "freqca", "hermite_order": 1}),
]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--bpc", type=int, default=4)
    parser.add_argument("--tau0", type=float, default=1.2)
    parser.add_argument("--R", type=int, default=100)
    args = parser.parse_args()

    import bench

    from fdtpu.metrics import SlicedWasserstein
    from fdtpu.sampling import DiffusionSampler

    model = bench.build_model(max_len=187, trained=True, epochs=args.epochs)
    n = args.batch * args.bpc

    uncached = DiffusionSampler(
        model, sample_batch_size=args.batch, batches_per_call=args.bpc
    )
    t_un, sps_un = bench.measure(uncached, n, args.steps, jax.random.PRNGKey(1))
    s_base = uncached.sample(n, args.steps, key=jax.random.PRNGKey(1))
    s_base2 = uncached.sample(n, args.steps, key=jax.random.PRNGKey(99))
    sw = SlicedWasserstein(
        original_samples=s_base, random_seed=42, num_directions=200
    )
    floor = float(sw(s_base2)["sliced_wasserstein_mean"])

    payload = {
        "protocol": {
            "steps": args.steps, "batch": args.batch, "bpc": args.bpc,
            "epochs": args.epochs, "tau_0": args.tau0, "R": args.R,
            "uncached_samples_per_s_chip": sps_un, "sw_noise_floor": floor,
        },
        "arms": {},
    }
    out = REPO / "docs" / "benchmarks" / "freqca_eps.json"
    for name, extra in ARMS:
        kwargs = {"level": "score", "R": args.R, "tau_0": args.tau0, **extra}
        sampler = DiffusionSampler(
            model, sample_batch_size=args.batch, use_cache=True,
            cache_kwargs=kwargs, batches_per_call=args.bpc,
        )
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            t_ca, sps_ca = bench.measure(
                sampler, n, args.steps, jax.random.PRNGKey(1)
            )
            sampler.last_cache_state = None
            s = sampler.sample(n, args.steps, key=jax.random.PRNGKey(1))
        stats = sampler.get_cache_stats()
        entry = {
            "samples_per_s_chip": sps_ca,
            "speedup_vs_uncached": t_un / t_ca,
            "sw_vs_uncached": float(sw(s)["sliced_wasserstein_mean"]),
            "guard_flagged": any(
                "error-budget guard" in str(w.message) for w in caught
            ),
            "steps_skipped_ratio": stats["steps_skipped_ratio"],
            "realized_err_mean": stats["realized_err_mean"],
            "realized_err_max": stats["realized_err_max"],
        }
        payload["arms"][name] = entry
        print(
            f"{name:<16} {entry['speedup_vs_uncached']:6.2f}x  "
            f"skip {100 * entry['steps_skipped_ratio']:.0f}%  "
            f"SW {entry['sw_vs_uncached']:.3f} (floor {floor:.3f})  "
            f"err {entry['realized_err_mean']:.2f}/{entry['realized_err_max']:.2f}"
            f"  flagged={entry['guard_flagged']}",
            file=sys.stderr,
        )
        out.write_text(json.dumps(payload, indent=2))

    base = payload["arms"]["taylor_order1"]
    best_freqca = max(
        (a for k, a in payload["arms"].items() if k.startswith("freqca")),
        key=lambda a: a["speedup_vs_uncached"] * (a["sw_vs_uncached"] <= floor),
    )
    payload["verdict"] = {
        "freqca_beats_taylor": (
            best_freqca["sw_vs_uncached"] <= floor
            and best_freqca["speedup_vs_uncached"]
            > base["speedup_vs_uncached"]
        ),
        "taylor_speedup": base["speedup_vs_uncached"],
        "best_freqca_speedup": best_freqca["speedup_vs_uncached"],
    }
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload["verdict"]))


if __name__ == "__main__":
    main()
