#!/usr/bin/env python
"""Block-collapsed skip execution sweep at the headline protocol.

Measures cached sampling throughput vs ``E2CRFConfig.block_size`` at the
shipped τ₀=1.2 operating point (T=1000, 512 samples as 4×128 per
dispatch, bench-trained flagship).  The block path replicates per-step
PRNG/policy/values (tests/test_block_collapse.py), so only speed changes:
iterations(k) ≈ (#blocks) + (#blocks containing a refresh)·k, minimized
around k ≈ √(T/#refreshes).

Writes docs/benchmarks/block_size.json incrementally.
"""

from __future__ import annotations

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

OUT = Path(__file__).resolve().parent.parent / "docs/benchmarks/block_size.json"


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--bpc", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument("--blocks", type=int, nargs="+",
                        default=[0, 4, 5, 8, 10, 20])
    args = parser.parse_args()

    from bench import CACHE_KWARGS, build_model, measure

    from fdtpu.metrics import SlicedWasserstein
    from fdtpu.sampling import DiffusionSampler

    n = args.batch * args.bpc
    model = build_model(max_len=187, trained=True, epochs=args.epochs)

    payload = json.loads(OUT.read_text()) if OUT.exists() else {}
    payload["config"] = {
        "steps": args.steps, "batch": args.batch, "bpc": args.bpc,
        "epochs": args.epochs, "cache": CACHE_KWARGS,
    }
    results = payload.setdefault("results", {})

    s_ref = None
    sw = None
    for bs in args.blocks:
        name = f"block{bs}"
        kw = dict(CACHE_KWARGS, block_size=bs)
        sampler = DiffusionSampler(
            model, sample_batch_size=args.batch, use_cache=True,
            cache_kwargs=kw, batches_per_call=args.bpc,
        )
        t_ca, sps = measure(sampler, n, args.steps, jax.random.PRNGKey(1))
        stats = sampler.get_cache_stats()
        sampler.last_cache_state = None
        s = sampler.sample(n, args.steps, key=jax.random.PRNGKey(1))
        entry = {
            "block_size": bs,
            "time_s": t_ca,
            "samples_per_s_chip": sps,
            "steps_skipped_ratio": stats["steps_skipped_ratio"],
            "full_steps": stats["full_steps"],
        }
        if bs == 0:
            s_ref = s
            sw = SlicedWasserstein(
                original_samples=s_ref, random_seed=42, num_directions=200
            )
        elif sw is not None:
            # Block mode must reproduce the per-step samples (same PRNG):
            # max-abs delta and SW vs the block0 run document it on-chip.
            entry["max_abs_delta_vs_block0"] = float(
                np.max(np.abs(s - s_ref))
            )
            entry["sw_vs_block0"] = float(
                sw(s)["sliced_wasserstein_mean"]
            )
        results[name] = entry
        print(
            f"{name:<8} {sps:7.1f} samples/s  skipped "
            f"{100 * stats['steps_skipped_ratio']:.1f}% "
            f"(full {stats['full_steps']})"
            + (f"  max|Δ| {entry['max_abs_delta_vs_block0']:.2e}"
               if "max_abs_delta_vs_block0" in entry else ""),
            file=sys.stderr,
        )
        OUT.write_text(json.dumps(payload, indent=2))

    print(json.dumps({k: round(v["samples_per_s_chip"], 1)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
