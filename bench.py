#!/usr/bin/env python
"""Headline benchmark: E²-CRF cached vs uncached sampling at matched quality.

Trains the flagship configuration (187 frequency tokens × 1 channel,
d_model=72, 10 layers, 12 heads ≈ 3.2M params — reference
conf/score_model/default.yaml) on generated synthetic series, then measures
samples/sec/chip over the reference's T=1000-step reverse diffusion:
uncached vs score-level E²-CRF caching with first-order ε̂ extrapolation at a
setting where the cached samples' sliced-Wasserstein distance to the uncached
run stays below the finite-sample noise floor (two independent uncached runs).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``value``  = E²-CRF speedup over the uncached compiled sampler (×), median
of repeated timings.  ``vs_baseline`` = value / 3.2 (the reference paper's
average speedup across its five datasets, BASELINE.md).

Flags: --quick (random weights, T=100, small batch — smoke test),
--steps/--batch/--epochs overrides.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import os

import jax

# Persistent compilation cache: the T=1000 scan compile is expensive on the
# first run; later runs hit the cache.  FDTPU_JAX_CACHE_DIR overrides the
# location (e.g. a throwaway dir to force a fresh compile — the protocol
# for guard-robustness proof runs, since XLA fusion differs across
# compiles and trajectories amplify it).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("FDTPU_JAX_CACHE_DIR", "/tmp/fdtpu_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

REFERENCE_AVG_SPEEDUP = 3.2  # paper §4.1: 2.1–4.3× across 5 datasets (CPU)

# Quality-validated cache setting on trained flagship models: ~97% of steps
# skipped with the cached samples' SW distance to the uncached run well below
# the independent-run noise floor AND the error-budget guard silent.  From
# the headline-protocol τ₀ frontier (docs/benchmarks/tau_headline.json,
# T=1000): τ₀=1.35 stays inside the floor (SW 0.290 vs 0.548 @n=2048);
# τ₀=1.5 crosses it.  The round-3 reason not to ship 1.35 (it tripped its
# own guard, err_max 4.21 > 4.0) was the unfloored end-of-trajectory
# denominator artifact; with the refresh-phase-invariant floored statistic
# it is guard-silent across three fresh-compile-cache full runs with
# quality fields identical to 4 decimals
# (docs/benchmarks/tau135_proof.md: 18.79x / 18.63x / 15.78x, the last
# self-flagged degraded_suspect under deliberate host load).  Guard
# tolerance calibration: guard_demo_v2.json across three independently
# trained flagships × T ∈ {500, 1000}; firing mechanism in
# scripts/diagnose_guard.py.
CACHE_KWARGS = {"level": "score", "R": 100, "tau_0": 1.35, "eps_order": 1}


def sliced_w2(a: np.ndarray, b: np.ndarray, directions: np.ndarray) -> float:
    """Mean over directions of the 1-D W₂ between equal-size projections
    (exact quantile coupling = sorted L2; fdtpu.metrics.wasserstein)."""
    pa = np.sort(a.reshape(len(a), -1) @ directions, axis=0)
    pb = np.sort(b.reshape(len(b), -1) @ directions, axis=0)
    return float(np.mean(np.sqrt(np.mean((pa - pb) ** 2, axis=0))))


def bootstrap_delta_ci(
    s_base: np.ndarray,
    s_base2: np.ndarray,
    s_cached: np.ndarray,
    directions: np.ndarray,
    n_boot: int = 200,
    seed: int = 7,
) -> tuple[float, float]:
    """95% bootstrap CI of SW(cached, base) − SW(base2, base) — the
    cached-vs-uncached quality delta net of the finite-sample floor.  All
    three sample sets are resampled with replacement per replicate."""
    rng = np.random.default_rng(seed)
    n = len(s_base)
    deltas = []
    for _ in range(n_boot):
        ib = rng.integers(0, n, n)
        ic = rng.integers(0, len(s_cached), len(s_cached))
        if2 = rng.integers(0, len(s_base2), len(s_base2))
        base = s_base[ib]
        deltas.append(
            sliced_w2(s_cached[ic], base, directions)
            - sliced_w2(s_base2[if2], base, directions)
        )
    lo, hi = np.percentile(deltas, [2.5, 97.5])
    return float(lo), float(hi)


def measure(sampler, num_samples, steps, key, min_total_s: float = 20.0,
            max_repeats: int = 15) -> tuple[float, float]:
    """Median of repeated timed runs.  Single-run timings on the TPU tunnel
    vary by up to 2x, and fast (cached) runs finish in ~1-2 s where that
    noise dominates — so repeat until at least ``min_total_s`` of measured
    time has accumulated (min 3 runs)."""
    out = sampler.sample(num_samples, steps, key=key)  # warmup/compile
    times = []
    while (len(times) < 3) or (sum(times) < min_total_s and len(times) < max_repeats):
        sampler.last_cache_state = None
        t0 = time.time()
        out = sampler.sample(num_samples, steps, key=key)
        times.append(time.time() - t0)
    assert np.isfinite(out).all()
    elapsed = float(np.median(times))
    return elapsed, out.shape[0] / elapsed


def measure_paired(
    uncached, cached, num_samples, steps, key, legs: int = 3,
    cached_repeats: int = 3,
) -> dict:
    """Load-resistant paired timing (VERDICT r4 ask #2).

    The TPU tunnel is shared: load bursts inflate wall time up to ~2.7×
    and hit the dispatch-heavy CACHED arm asymmetrically, so timing the
    two arms in separate windows swung the headline 18.0→14.7 on load
    alone while every quality field stayed identical (guard_proof.md).
    Fix: interleave — each LEG times one uncached run and
    ``cached_repeats`` cached runs back-to-back in the same window, the
    per-leg speedup is computed within that window, and the headline is
    the MEDIAN over ``legs`` legs.  A burst that lands inside one leg
    skews both of that leg's arms together (ratio partially cancels) and
    the cross-leg median rejects a wholly degraded leg.

    Returns per-leg telemetry so a degraded capture is self-identifying:
    ``speedup_spread`` = (max−min)/median of the leg speedups; ≳0.25
    means the tunnel was loaded during the run and the number should be
    re-captured on an idle tunnel (three idle-tunnel guard-proof runs
    spread <0.1 in per-leg terms)."""
    for s in (uncached, cached):  # warmup/compile both arms first
        s.last_cache_state = None
        out = s.sample(num_samples, steps, key=key)
        assert np.isfinite(out).all()
    leg_speedups, leg_un_t, leg_ca_t = [], [], []
    for _ in range(legs):
        t0 = time.time()
        uncached.sample(num_samples, steps, key=key)
        t_un = time.time() - t0
        t_cas = []
        for _ in range(cached_repeats):
            cached.last_cache_state = None
            t0 = time.time()
            cached.sample(num_samples, steps, key=key)
            t_cas.append(time.time() - t0)
        t_ca = float(np.median(t_cas))
        leg_un_t.append(t_un)
        leg_ca_t.append(t_ca)
        leg_speedups.append(t_un / t_ca)
    t_un = float(np.median(leg_un_t))
    t_ca = float(np.median(leg_ca_t))
    speedup = float(np.median(leg_speedups))
    spread = float(
        (max(leg_speedups) - min(leg_speedups)) / np.median(leg_speedups)
    )
    return {
        "speedup": speedup,
        "t_un": t_un,
        "t_ca": t_ca,
        "sps_un": num_samples / t_un,
        "sps_ca": num_samples / t_ca,
        "leg_speedups": [round(s, 3) for s in leg_speedups],
        "leg_uncached_s": [round(t, 2) for t in leg_un_t],
        "leg_cached_s": [round(t, 2) for t in leg_ca_t],
        "speedup_spread": round(spread, 3),
        "degraded_suspect": spread > 0.25,
    }


# Populated by build_model(trained=True); consumed by main()'s load sentinel.
LAST_TRAIN_STATS: dict = {}


def build_model(max_len: int, trained: bool, epochs: int, seed: int = 42):
    """Flagship model; ``seed`` controls init + training so independently
    trained replicas (guard calibration across retrains) differ."""
    global LAST_TRAIN_STATS

    from fdtpu.data import SyntheticDatamodule
    from fdtpu.diffusion import VPScheduler
    from fdtpu.models import ScoreModelConfig, init_score_model
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.train import Trainer, get_training_params

    cfg = ScoreModelConfig(
        n_channels=1, max_len=max_len, attention_impl="blockdiag"
    )
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(max_len)
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(seed - 42), cfg),
        scheduler=scheduler,
    )
    if not trained:
        return model

    # Opt-in trained-weights cache for the auxiliary measurement harnesses
    # (bench_freqca/bench_noshift/ablation refreshes all need the SAME
    # trained flagship; retraining it per harness costs ~5 min each on the
    # tunnel).  Deliberately env-gated and OFF for the headline protocol:
    # `python bench.py` with no env trains fresh, as the driver measures it.
    cache_root = os.environ.get("FDTPU_WEIGHTS_CACHE")
    ckpt_dir = None
    if cache_root:
        ckpt_dir = (
            Path(cache_root) / f"flagship_ml{max_len}_e{epochs}_s{seed}.ckpt"
        )
        if (ckpt_dir / "meta.json").exists():
            from fdtpu.train.checkpoint import load_checkpoint

            print(f"# loaded cached flagship weights: {ckpt_dir}",
                  file=sys.stderr)
            LAST_TRAIN_STATS = {
                "train_time_s": 0.0, "weights_cache": str(ckpt_dir)
            }
            return load_checkpoint(ckpt_dir)

    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=max_len, num_samples=2000,
        batch_size=64, fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    params = get_training_params(dm, max_epochs=epochs)
    model.num_training_steps = params["num_training_steps"]
    trainer = Trainer(
        max_epochs=epochs, run_dir=tempfile.mkdtemp(), seed=seed,
        log_every_n_steps=10_000,
    )
    t0 = time.time()
    model = trainer.fit(model, dm)
    train_time = time.time() - t0
    seen = epochs * len(dm.X_train)  # samples seen (train split size)
    # Load sentinel input: training throughput is compute-bound and its
    # idle-tunnel value is known (~150 samples/s/chip at the flagship
    # protocol; the documented degraded window ran 4× slower), so a slow
    # training leg flags the capture (module global, read by main()'s JSON).
    LAST_TRAIN_STATS = {
        "train_time_s": round(train_time, 1),
        "train_samples_per_s": round(seen / train_time, 1),
        "best_val_loss": float(trainer.best_val_loss),
    }
    print(
        f"# trained flagship on synthetic-freq data: {epochs} epochs in "
        f"{train_time:.0f}s ({seen / train_time:.0f} training samples/s/chip), "
        f"best val/loss {trainer.best_val_loss:.5f}",
        file=sys.stderr,
    )
    if ckpt_dir is not None:
        import shutil

        from fdtpu.train.checkpoint import save_checkpoint

        # save_checkpoint names the dir itself (<run>/checkpoints/epoch=…);
        # move it to the flat cache-key path build_model looks up.
        saved = save_checkpoint(
            ckpt_dir.parent, model, epoch=epochs,
            val_loss=float(trainer.best_val_loss),
        )
        if ckpt_dir.exists():
            shutil.rmtree(ckpt_dir)
        saved.rename(ckpt_dir)
        print(f"# cached flagship weights: {ckpt_dir}", file=sys.stderr)
    return model


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=25)
    parser.add_argument(
        "--quality-samples", type=int, default=2048,
        help="sample count for the UNTIMED quality legs (SW/MW vs floor + "
        "bootstrap CI); the timing legs stay at batch * batches_per_call",
    )
    parser.add_argument(
        "--batches-per-call", type=int, default=4,
        help="full-size batches sampled per jitted dispatch (device-resident "
        "scan over trajectories); num_samples = batch * batches_per_call",
    )
    parser.add_argument(
        "--tau0", type=float, default=None,
        help="override CACHE_KWARGS['tau_0'] (frontier/proof runs; the "
        "shipped default stays the module constant)",
    )
    args = parser.parse_args()

    from fdtpu.metrics import SlicedWasserstein
    from fdtpu.sampling import DiffusionSampler

    steps = args.steps or (100 if args.quick else 1000)
    batch = min(args.batch, 16) if args.quick else args.batch
    # Device-resident grouped sampling: all batches of a measurement run in
    # ONE jitted dispatch (DiffusionSampler(batches_per_call=...)), so the
    # fixed ~0.3-0.4 s tunnel dispatch cost is paid once per run instead of
    # once per batch — it otherwise dominates cached trajectories that
    # execute in ~0.3 s.  Identical sample values / cache semantics to the
    # per-batch loop (tests/test_resident_sampling.py).
    # --quick caps the grouping at 2 (smoke both the resident path and the
    # group logic fast) but still honors an explicit lower --batches-per-call.
    bpc = min(args.batches_per_call, 2) if args.quick else args.batches_per_call
    num_samples = batch * bpc

    model = build_model(max_len=187, trained=not args.quick, epochs=args.epochs)

    uncached = DiffusionSampler(
        model, sample_batch_size=batch, batches_per_call=bpc
    )
    cache_kwargs = dict(CACHE_KWARGS)
    if args.tau0 is not None:
        cache_kwargs["tau_0"] = args.tau0
    cached = DiffusionSampler(
        model, sample_batch_size=batch, use_cache=True,
        cache_kwargs=cache_kwargs, batches_per_call=bpc,
    )
    timing = measure_paired(
        uncached, cached, num_samples, steps, jax.random.PRNGKey(1),
        legs=2 if args.quick else 3,
        cached_repeats=2 if args.quick else 3,
    )
    sps_un, sps_ca = timing["sps_un"], timing["sps_ca"]
    stats = cached.get_cache_stats()

    quality = ""
    quality_record = {}
    if not args.quick:
        from fdtpu.metrics import MarginalWasserstein

        # Quality certificate, DECOUPLED from the timing protocol (VERDICT
        # r3 ask #2): the quality legs are untimed, so they run at
        # --quality-samples (default 2048, floor ∝ 1/√n → ~0.29 where the
        # timed n=512 floor was 0.58) — tight enough to catch the paper's
        # own ±5% quality band.  Reported: SW(cached, uncached) vs the
        # independent-run noise floor SW(uncached', uncached), a 95%
        # bootstrap CI on their difference, and the per-feature
        # marginal-Wasserstein delta (the BASELINE.json gate's metric).
        n_q = max(args.quality_samples, num_samples)
        s_base = uncached.sample(n_q, steps, key=jax.random.PRNGKey(1))
        s_base2 = uncached.sample(n_q, steps, key=jax.random.PRNGKey(99))
        cached.last_cache_state = None
        s_ca = cached.sample(n_q, steps, key=jax.random.PRNGKey(1))
        sw = SlicedWasserstein(
            original_samples=s_base, random_seed=42, num_directions=200
        )
        floor = sw(s_base2)["sliced_wasserstein_mean"]
        delta = sw(s_ca)["sliced_wasserstein_mean"]
        # Same direction-sampling convention as WassersteinDistances(seed=42).
        rng_dir = np.random.default_rng(42)
        dim = int(np.prod(s_base.shape[1:]))
        dirs = rng_dir.normal(size=(200, dim))
        directions = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).T
        ci_lo, ci_hi = bootstrap_delta_ci(
            np.asarray(s_base), np.asarray(s_base2), np.asarray(s_ca),
            directions,
        )
        mw = MarginalWasserstein(original_samples=s_base, random_seed=42)
        mw_floor = mw(s_base2)["marginal_wasserstein_mean"]
        mw_cached = mw(s_ca)["marginal_wasserstein_mean"]
        # Signed like sw_delta_vs_floor: negative = cached is CLOSER to the
        # uncached run than a second independent uncached run (i.e. within
        # the finite-sample floor).  abs() here used to make "0.55 below the
        # floor" read identically to "0.55 above".
        mw_delta = mw_cached - mw_floor
        quality = (
            f" | SW(cached,uncached) {delta:.3f} vs floor {floor:.3f} @n={n_q}"
            f" | delta CI95 [{ci_lo:+.3f}, {ci_hi:+.3f}]"
            f" | MW delta vs floor {mw_delta:+.4f}"
        )
        quality_record = {
            "quality_n": n_q,
            "sw_cached_vs_uncached": round(float(delta), 4),
            f"sw_floor_n{n_q}": round(float(floor), 4),
            "sw_delta_vs_floor": round(float(delta - floor), 4),
            "sw_delta_ci95": [round(ci_lo, 4), round(ci_hi, 4)],
            # Cached-vs-uncached quality in marginal-Wasserstein terms at
            # this n (each MW value carries finite-sample noise — see the
            # self-floor).  NOT the BASELINE 1e-3 reference-parity gate:
            # that one is demonstrated by the same-weights trajectory
            # replay in docs/benchmarks/quality_parity.md.
            "mw_cached_vs_uncached": round(float(mw_cached), 4),
            "mw_self_floor": round(float(mw_floor), 4),
            "mw_delta_vs_floor": round(float(mw_delta), 4),
        }

    speedup = timing["speedup"]
    print(
        f"# uncached {sps_un:.1f} samples/s/chip | e2crf {sps_ca:.1f} samples/s/chip "
        f"| skipped {100 * stats['steps_skipped_ratio']:.0f}% of {steps} steps "
        f"| legs {timing['leg_speedups']} spread {timing['speedup_spread']}"
        f"{' [DEGRADED TUNNEL SUSPECT]' if timing['degraded_suspect'] else ''}"
        f"{quality}",
        file=sys.stderr,
    )
    record = {
        "metric": "e2crf_sampling_speedup",
        "value": round(speedup, 3),
        "unit": (
            f"x vs uncached compiled sampler (T={steps}, {num_samples} samples "
            f"as {bpc}x batch {batch} per dispatch, 3.2M-param flagship, "
            f"1 chip; quality within noise floor; median of "
            f"{len(timing['leg_speedups'])} interleaved paired legs)"
        ),
        "vs_baseline": round(speedup / REFERENCE_AVG_SPEEDUP, 3),
        # Load sentinel (VERDICT r4 ask #2): per-leg speedups + spread make
        # a tunnel-degraded capture self-identifying; the training leg's
        # throughput is compute-bound with a known idle value (~150
        # samples/s/chip), so a slow value corroborates.
        "timing_legs": timing["leg_speedups"],
        "timing_spread": timing["speedup_spread"],
        "degraded_suspect": timing["degraded_suspect"],
        "uncached_samples_per_s": round(sps_un, 2),
        "cached_samples_per_s": round(sps_ca, 2),
        "tau_0": cache_kwargs["tau_0"],
        **LAST_TRAIN_STATS,
        **quality_record,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
