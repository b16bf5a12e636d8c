#!/usr/bin/env python
"""What bounds a skipped diffusion step? (headline-speedup ceiling probe)

At 95% step-skipping the cached chain's cost is dominated by the per-step
work that CANNOT be skipped: the Euler–Maruyama update, the reverse-noise
draw, and the scan/cond plumbing.  This script times, at flagship shapes
(batch 128 × 187 × 1, T=1000):

* scan_full    — the real uncached sampler body (reference point)
* scan_skip    — the real cached sampler at an always-skip setting
* scan_em_only — scheduler step + per-step `jax.random.normal` (no model)
* scan_em_pre  — scheduler step with ALL noise pre-generated outside the
                 scan (one big draw, passed as scan xs)
* scan_noise   — per-step normal draw alone

If scan_em_pre << scan_em_only, per-step threefry PRNG is the bottleneck
and pre-generating (or switching the generator) raises the skip ceiling.

Writes docs/benchmarks/skip_floor.json.
"""

from __future__ import annotations

import json
import sys
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

import jax.numpy as jnp
import numpy as np

from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler

B, T_LEN, C, STEPS = 128, 187, 1, 1000


def timeit(fn, *args, repeats=5):
    out = jax.block_until_ready(fn(*args))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    del out
    return float(np.median(times))


def main() -> None:
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(T_LEN)
    ts, step_size = scheduler.timesteps(STEPS)
    x0 = scheduler.prior_sampling(jax.random.PRNGKey(0), (B, T_LEN, C))
    fake_score = jnp.zeros((B, T_LEN, C))

    results: dict[str, float] = {}

    @jax.jit
    def scan_em_only(x0, key):
        def body(carry, t):
            x, k = carry
            k, kn = jax.random.split(k)
            z = jax.random.normal(kn, x.shape, x.dtype)
            x = scheduler.step(fake_score, t, x, z, step_size)
            return (x, k), None

        (x, _), _ = jax.lax.scan(body, (x0, key), ts)
        return x

    results["scan_em_only"] = timeit(scan_em_only, x0, jax.random.PRNGKey(1))

    @jax.jit
    def scan_em_pre(x0, key):
        zs = jax.random.normal(key, (STEPS, B, T_LEN, C))

        def body(x, tz):
            t, z = tz
            return scheduler.step(fake_score, t, x, z, step_size), None

        x, _ = jax.lax.scan(body, x0, (ts, zs))
        return x

    results["scan_em_pre"] = timeit(scan_em_pre, x0, jax.random.PRNGKey(1))

    @jax.jit
    def scan_noise(key):
        def body(k, _):
            k, kn = jax.random.split(k)
            z = jax.random.normal(kn, (B, T_LEN, C))
            return k, jnp.sum(z)

        _, outs = jax.lax.scan(body, key, ts)
        return outs.sum()

    results["scan_noise"] = timeit(scan_noise, jax.random.PRNGKey(1))

    # Real samplers at flagship shapes (random weights — speed only).
    cfg = ScoreModelConfig(n_channels=C, max_len=T_LEN, attention_impl="blockdiag")
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
    )
    uncached = DiffusionSampler(model, sample_batch_size=B)

    def run_uncached():
        return uncached.sample(B, STEPS, key=jax.random.PRNGKey(1))

    results["scan_full"] = timeit(run_uncached, repeats=3)

    skater = DiffusionSampler(
        model, sample_batch_size=B, use_cache=True,
        cache_kwargs={"level": "score", "R": 999999, "tau_0": 1e9, "eps_order": 0},
    )

    def run_skip():
        skater.last_cache_state = None
        return skater.sample(B, STEPS, key=jax.random.PRNGKey(1))

    results["scan_skip"] = timeit(run_skip, repeats=3)
    stats = skater.get_cache_stats()
    results["skip_ratio"] = stats["steps_skipped_ratio"]

    for k, v in results.items():
        print(f"{k:<14} {v:8.4f}", file=sys.stderr)

    out = Path(__file__).resolve().parent.parent / "docs/benchmarks/skip_floor.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({"shapes": [B, T_LEN, C, STEPS], "results": results}, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
