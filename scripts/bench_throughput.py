#!/usr/bin/env python
"""Uncached single-chip throughput experiments (VERDICT round-1 weak #3).

Measures the flagship's uncached sampling throughput (batch 128) across:

* attention_impl ∈ {einsum, blockdiag} × compute_dtype ∈ {float32, bfloat16}
* a lane-aligned d_model=128 / head_dim=8 variant (more params, but every
  matmul dimension is a multiple of the 128-lane MXU width) — context for
  whether d72/head_dim-6 misalignment is what bounds the d72 flagship.

Writes docs/benchmarks/throughput.json.

Usage: python scripts/bench_throughput.py [--steps 500] [--batch 128]
"""

from __future__ import annotations

import argparse
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

import numpy as np

from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler


def measure(sampler, n, steps, min_total_s=12.0, max_repeats=10):
    sampler.sample(n, steps, key=jax.random.PRNGKey(0))  # compile
    times = []
    while len(times) < 3 or (sum(times) < min_total_s and len(times) < max_repeats):
        sampler.last_cache_state = None  # fresh cache per timed run
        t0 = time.time()
        out = sampler.sample(n, steps, key=jax.random.PRNGKey(1))
        times.append(time.time() - t0)
    assert np.isfinite(out).all()
    t = float(np.median(times))
    return t, out.shape[0] / t


# TPU v5e (the bench chip) peak dense matmul throughput.  MFU is reported
# against the bf16 peak for BOTH dtypes — the honest convention given fp32
# matmuls also execute on the (bf16) MXU via multi-pass.
V5E_PEAK_FLOPS = 197e12
# Epoch count for every timed training fit.  Single-sourced so the
# consumed-sample count (TIMED_EPOCHS * len(dm.X_train)) can never silently
# diverge from the Trainer(max_epochs=...) that actually ran (VERDICT r3 #6).
TIMED_EPOCHS = 2


def forward_flops(d_model: int, n_head: int, num_layers: int,
                  dim_feedforward: int, max_len: int, n_channels: int) -> float:
    """Analytic dense-matmul FLOPs of one score-network forward
    (multiply+add = 2 FLOPs; encoder per layer: QKV+out projections
    8·T·D², attention scores+AV 4·T²·D, FFN 4·T·D·F; plus embed/unembed)."""
    t, d, f = max_len, d_model, dim_feedforward
    per_layer = 8 * t * d * d + 4 * t * t * d + 4 * t * d * f
    embed = 4 * t * n_channels * d
    return float(num_layers * per_layer + embed)


def sampling_mfu(samples_per_s: float, steps: int, flops_fwd: float) -> float:
    """Model-FLOPs utilization of a sampling run: each diffusion step is
    one forward per sample."""
    return samples_per_s * steps * flops_fwd / V5E_PEAK_FLOPS


def bench_frontier(args) -> None:
    """Batch-scaling frontier (VERDICT round-2 ask #2): samples/s/chip and
    MFU across batch ∈ {128..1024} × dtype for uncached (blockdiag) and
    cached (score-level) sampling, plus training batch 64→512.  Answers
    whether the latency-bound batch-128 operating point amortizes at
    larger batches."""
    out = Path(__file__).resolve().parent.parent / "docs/benchmarks/throughput.json"
    payload = json.loads(out.read_text()) if out.exists() else {"results": {}}
    frontier = payload.setdefault("frontier", {})
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(
        args.max_len
    )
    model_cache: dict[str, ScoreModel] = {}

    def get_model(dtype: str) -> ScoreModel:
        if dtype not in model_cache:
            if args.model_id:
                from fdtpu.train import get_best_checkpoint, load_checkpoint

                ckpt = get_best_checkpoint(
                    Path(__file__).resolve().parent.parent
                    / "lightning_logs" / args.model_id / "checkpoints"
                )
                model_cache[dtype] = load_checkpoint(
                    ckpt, attention_impl="blockdiag", compute_dtype=dtype
                )
            else:
                cfg = ScoreModelConfig(
                    n_channels=1, max_len=args.max_len,
                    attention_impl="blockdiag", compute_dtype=dtype,
                )
                model_cache[dtype] = ScoreModel(
                    config=cfg,
                    variables=init_score_model(jax.random.PRNGKey(0), cfg),
                    scheduler=scheduler,
                )
        return model_cache[dtype]

    # MFU is computed against the measured model's own analytic FLOPs (a
    # trained --model-id checkpoint may not be the d72 flagship).
    mcfg = get_model("float32").config
    flops = forward_flops(mcfg.d_model, mcfg.n_head, mcfg.num_layers,
                          mcfg.dim_feedforward, mcfg.max_len, mcfg.n_channels)
    payload.setdefault("frontier_config", {
        "steps": args.steps, "max_len": args.max_len,
        "flops_per_forward": flops, "peak_flops": V5E_PEAK_FLOPS,
        "mfu_convention": "vs bf16 peak for both dtypes",
        "batch_1024_note": "reproducibly faults the TPU device (recorded "
                           "error entries); sweep capped at 512",
    })

    # With a trained model only the cached arms are worth re-measuring:
    # uncached throughput is weight-independent, the realized skip ratio
    # (and hence cached samples/s) is not.
    trained = f"_trained@{args.model_id}" if args.model_id else ""
    for batch in (128, 256, 512):
        for dtype in ("float32", "bfloat16"):
            short = "fp32" if dtype == "float32" else "bf16"
            for cached in ((True,) if args.model_id else (False, True)):
                name = f"{'cached' if cached else 'uncached'}_{short}_b{batch}{trained}"
                if name in frontier and not args.refresh:
                    continue
                kwargs = (
                    dict(use_cache=True, cache_kwargs={
                        "level": "score", "R": 100, "tau_0": 1.0,
                        "eps_order": 1, "guard": "off",
                    })
                    if cached
                    else {}
                )
                sampler = DiffusionSampler(
                    get_model(dtype), sample_batch_size=batch, **kwargs
                )
                try:
                    t, sps = measure(sampler, batch, args.steps)
                except Exception as exc:  # device fault: record, keep going
                    frontier[name] = {"error": str(exc)[:200], "batch": batch}
                    print(f"{name:<22} FAILED: {exc}", file=sys.stderr)
                    out.write_text(json.dumps(payload, indent=2))
                    continue
                entry = {
                    "time_s": t, "samples_per_s_chip": sps, "batch": batch,
                    "steps": args.steps,
                    "mfu": sampling_mfu(sps, args.steps, flops),
                }
                if cached:
                    stats = sampler.get_cache_stats()
                    entry["steps_skipped_ratio"] = stats["steps_skipped_ratio"]
                    # MFU of the FLOPs actually executed (skipped steps
                    # run no forward).
                    entry["mfu_executed"] = sampling_mfu(
                        sps,
                        int(args.steps * (1 - stats["steps_skipped_ratio"])),
                        flops,
                    )
                frontier[name] = entry
                print(
                    f"{name:<22} {t:7.2f}s  {sps:8.1f} samples/s/chip  "
                    f"mfu {100 * entry['mfu']:.1f}%", file=sys.stderr
                )
                out.write_text(json.dumps(payload, indent=2))  # incremental

    if args.model_id:
        print(json.dumps(frontier))
        return

    # Training frontier: batch 64 → 512, best sampler dtype each.
    import tempfile

    from fdtpu.data import SyntheticDatamodule
    from fdtpu.train import Trainer

    # einsum fp32 is the parity arm; blockdiag bf16 is the recommended
    # training config (Pallas fwd+bwd — its custom VJP stores only q/k/v
    # residuals, so it also fits batch 512 where einsum's fp32 softmax
    # residuals OOM).
    # The *_resident arm runs the device-resident training loop
    # (Trainer(epochs_per_call=2): both epochs in ONE jitted dispatch, data
    # in HBM, device-side shuffle) — the other arms use the host loop with
    # chunked dispatch (steps_per_call=16).
    for impl, dtype, short, tkw in (
        ("einsum", "float32", "einsum_fp32", {}),
        ("blockdiag", "bfloat16", "blockdiag_bf16", {}),
        ("blockdiag", "bfloat16", "blockdiag_bf16_resident",
         {"epochs_per_call": TIMED_EPOCHS}),
    ):
        for batch in (64, 128, 256, 512):
            name = f"train_{short}_b{batch}"
            if name in frontier and not args.refresh:
                continue
            dm = SyntheticDatamodule(
                data_dir=tempfile.mkdtemp(), max_len=args.max_len,
                num_samples=2048, batch_size=batch, fourier_transform=True,
                standardize=True,
            )
            dm.prepare_data()
            dm.setup()
            cfg = ScoreModelConfig(
                n_channels=1, max_len=args.max_len, attention_impl=impl,
                compute_dtype=dtype,
            )

            def fresh_model():
                return ScoreModel(
                    config=cfg,
                    variables=init_score_model(jax.random.PRNGKey(0), cfg),
                    scheduler=scheduler,
                    num_training_steps=TIMED_EPOCHS * len(dm.train_dataloader()),
                )

            try:
                # Warm with the SAME epoch count/chunking as the timed fit:
                # the resident loop's scan length is part of the compiled
                # program, so a 1-epoch warmup would not warm the cache.
                Trainer(max_epochs=TIMED_EPOCHS, run_dir=tempfile.mkdtemp(), seed=42,
                        log_every_n_steps=10_000, **tkw).fit(fresh_model(), dm)
                t0 = time.time()
                Trainer(max_epochs=TIMED_EPOCHS, run_dir=tempfile.mkdtemp(), seed=42,
                        log_every_n_steps=10_000, **tkw).fit(fresh_model(), dm)
            except Exception as exc:  # OOM/device fault: record, keep going
                frontier[name] = {"error": str(exc)[:200], "batch": batch}
                print(f"{name:<22} FAILED: {str(exc)[:120]}", file=sys.stderr)
                out.write_text(json.dumps(payload, indent=2))
                continue
            elapsed = time.time() - t0
            n_consumed = TIMED_EPOCHS * len(dm.X_train)
            sps = n_consumed / elapsed
            frontier[name] = {
                "time_s_2_epochs": elapsed, "train_samples_per_s_chip": sps,
                "batch": batch,
                # fwd + bwd ≈ 3× forward FLOPs per consumed sample.
                "mfu": sps * 3 * flops / V5E_PEAK_FLOPS,
            }
            print(f"{name:<22} {elapsed:7.2f}s  {sps:8.1f} train samples/s/chip  "
                  f"mfu {100 * frontier[name]['mfu']:.1f}%", file=sys.stderr)
            out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(frontier))


def bench_training(args) -> None:
    """Training throughput (samples/s/chip) per attention/dtype variant:
    full jitted train step (loss → grad → AdamW update), synthetic-freq
    data, batch 64.  First fit warms the persistent compile cache; the
    timed fit is a fresh Trainer over 2 epochs."""
    import tempfile

    from fdtpu.data import SyntheticDatamodule
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.train import Trainer

    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=args.max_len, num_samples=2000,
        batch_size=64, fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(
        args.max_len
    )
    variants = [
        ("train_einsum_fp32", dict(attention_impl="einsum", compute_dtype="float32")),
        ("train_blockdiag_fp32", dict(attention_impl="blockdiag", compute_dtype="float32")),
        ("train_einsum_bf16", dict(attention_impl="einsum", compute_dtype="bfloat16")),
        ("train_blockdiag_bf16", dict(attention_impl="blockdiag", compute_dtype="bfloat16")),
    ]
    out = Path(__file__).resolve().parent.parent / "docs/benchmarks/throughput.json"
    payload = json.loads(out.read_text()) if out.exists() else {"results": {}}
    for name, overrides in variants:
        cfg = ScoreModelConfig(n_channels=1, max_len=args.max_len, **overrides)

        def fresh_model():
            return ScoreModel(
                config=cfg,
                variables=init_score_model(jax.random.PRNGKey(0), cfg),
                scheduler=scheduler,
                num_training_steps=TIMED_EPOCHS * len(dm.train_dataloader()),
            )

        Trainer(max_epochs=1, run_dir=tempfile.mkdtemp(), seed=42,
                log_every_n_steps=10_000).fit(fresh_model(), dm)  # warm cache
        t0 = time.time()
        Trainer(max_epochs=TIMED_EPOCHS, run_dir=tempfile.mkdtemp(), seed=42,
                log_every_n_steps=10_000).fit(fresh_model(), dm)
        elapsed = time.time() - t0
        # Derive the consumed-sample count from the datamodule (NumpyLoader
        # is drop_last=False, so one epoch consumes the full train split).
        n_consumed = TIMED_EPOCHS * len(dm.X_train)
        sps = n_consumed / elapsed
        payload["results"][name] = {
            "time_s_2_epochs": elapsed, "train_samples_per_s_chip": sps,
            "batch": dm.batch_size, "max_len": args.max_len,
        }
        print(f"{name:<22} {elapsed:7.2f}s  {sps:7.1f} train samples/s/chip",
              file=sys.stderr)
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload["results"]))


def bench_model_scaling(args) -> None:
    """Model-size MFU scaling: is the flagship's single-digit MFU a
    model-size artifact or a framework ceiling?

    The d128 lane-alignment probe showed d72 is latency/bandwidth-bound
    (2.4× the FLOPs for only 1.35× the time); this sweep extends the
    question to d256/d512 — where the MXU should finally saturate — and
    re-asks the einsum-vs-Pallas and fp32-vs-bf16 questions at head dims
    the blockdiag kernel was never tuned for (it packs per-head blocks;
    its win was measured at head_dim 6).  Architecture follows the
    reference's fixed dim_feedforward=2048 (torch encoder-layer default,
    reference score_models.py) so d_model/n_head is the only knob.

    Writes a ``model_scaling`` section into throughput.json (incremental,
    per-arm error capture — the remote compiler 500s on some large Pallas
    kernels and big arms can OOM/fault)."""
    out = Path(__file__).resolve().parent.parent / "docs/benchmarks/throughput.json"
    payload = json.loads(out.read_text()) if out.exists() else {"results": {}}
    scaling = payload.setdefault("model_scaling", {})
    scaling["config"] = {
        "batch": args.batch, "steps": args.steps, "max_len": args.max_len,
        "num_layers": 10, "dim_feedforward": 2048,
        "mfu_convention": "vs bf16 peak for both dtypes",
    }
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(
        args.max_len
    )
    sizes = [(72, 12), (128, 16), (256, 16), (512, 16)]
    variants = [
        ("einsum", "float32", "einsum_fp32"),
        ("einsum", "bfloat16", "einsum_bf16"),
        ("blockdiag", "bfloat16", "blockdiag_bf16"),
    ]
    for d, h in sizes:
        for impl, dtype, short in variants:
            name = f"d{d}H{h}_{short}"
            if name in scaling and not args.refresh:
                continue
            cfg = ScoreModelConfig(
                n_channels=1, max_len=args.max_len, d_model=d, n_head=h,
                attention_impl=impl, compute_dtype=dtype,
            )
            flops = forward_flops(cfg.d_model, cfg.n_head, cfg.num_layers,
                                  cfg.dim_feedforward, cfg.max_len,
                                  cfg.n_channels)
            model = ScoreModel(
                config=cfg,
                variables=init_score_model(jax.random.PRNGKey(0), cfg),
                scheduler=scheduler,
            )
            sampler = DiffusionSampler(model, sample_batch_size=args.batch)
            try:
                t, sps = measure(sampler, args.batch, args.steps)
            except Exception as exc:  # compiler 500 / OOM / device fault
                scaling[name] = {"error": str(exc)[:200]}
                print(f"{name:<26} FAILED: {str(exc)[:120]}", file=sys.stderr)
                out.write_text(json.dumps(payload, indent=2))
                continue
            scaling[name] = {
                "time_s": t, "samples_per_s_chip": sps,
                "flops_per_forward": flops,
                "mfu": sampling_mfu(sps, args.steps, flops),
                "head_dim": cfg.head_dim,
            }
            print(f"{name:<26} {t:7.2f}s  {sps:8.1f} samples/s/chip  "
                  f"mfu {100 * scaling[name]['mfu']:.1f}%", file=sys.stderr)
            out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(scaling))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--max-len", type=int, default=187)
    parser.add_argument("--model-id", type=str, default=None,
                        help="trained run id: adds a bf16-vs-fp32 sample-quality check")
    parser.add_argument("--quality-only", action="store_true",
                        help="skip the variant timings (merge into existing json)")
    parser.add_argument("--train", action="store_true",
                        help="measure TRAINING throughput per variant instead")
    parser.add_argument("--frontier", action="store_true",
                        help="batch-scaling frontier + MFU (sampling "
                             "batch 128-1024, training 64-512)")
    parser.add_argument("--refresh", action="store_true",
                        help="re-measure frontier points that already exist")
    parser.add_argument("--flagship", action="store_true",
                        help="store --model-id results under the unsuffixed "
                             "flagship keys (bf16_quality/cached_*)")
    parser.add_argument("--model-scaling", action="store_true",
                        help="model-size MFU sweep (d_model 72-512, "
                             "einsum/blockdiag x fp32/bf16)")
    args = parser.parse_args()
    if args.model_scaling:
        bench_model_scaling(args)
        return
    if args.frontier:
        bench_frontier(args)
        return
    if args.train:
        bench_training(args)
        return

    variants = [
        ("einsum_fp32", dict(attention_impl="einsum", compute_dtype="float32")),
        ("blockdiag_fp32", dict(attention_impl="blockdiag", compute_dtype="float32")),
        ("einsum_bf16", dict(attention_impl="einsum", compute_dtype="bfloat16")),
        ("blockdiag_bf16", dict(attention_impl="blockdiag", compute_dtype="bfloat16")),
    ]
    out = Path(__file__).resolve().parent.parent / "docs/benchmarks/throughput.json"
    # Always merge into the existing file: a plain (sampling-variant) run
    # refreshes its own keys without destroying the train_*/quality/@run
    # entries the other modes accumulated.
    results: dict[str, dict] = {}
    if out.exists():
        results = json.loads(out.read_text()).get("results", {})

    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(
        args.max_len
    )
    base_variables = None
    for name, overrides in [] if args.quality_only else variants:
        cfg = ScoreModelConfig(n_channels=1, max_len=args.max_len, **overrides)
        if base_variables is None:
            base_variables = init_score_model(jax.random.PRNGKey(0), cfg)
        model = ScoreModel(
            config=cfg, variables=base_variables, scheduler=scheduler
        )
        sampler = DiffusionSampler(model, sample_batch_size=args.batch)
        t, sps = measure(sampler, args.batch, args.steps)
        results[name] = {"time_s": t, "samples_per_s_chip": sps,
                         "batch": args.batch, "steps": args.steps}
        print(f"{name:<18} {t:7.2f}s  {sps:7.1f} samples/s/chip", file=sys.stderr)

    if not args.quality_only:
        # Lane-aligned reference: d128/H16 (dh=8) — 2.4x the FLOPs of d72 in
        # attention projections and 1.78x in the FFN contraction, but every
        # dimension tiles cleanly onto the 128-lane MXU.
        cfg128 = ScoreModelConfig(
            n_channels=1, max_len=args.max_len, d_model=128, n_head=16,
            attention_impl="einsum", compute_dtype="float32",
        )
        model128 = ScoreModel(
            config=cfg128,
            variables=init_score_model(jax.random.PRNGKey(0), cfg128),
            scheduler=scheduler,
        )
        t, sps = measure(
            DiffusionSampler(model128, sample_batch_size=args.batch),
            args.batch, args.steps,
        )
        results["d128_h16_fp32"] = {"time_s": t, "samples_per_s_chip": sps,
                                    "batch": args.batch, "steps": args.steps}
        print(f"{'d128_h16_fp32':<18} {t:7.2f}s  {sps:7.1f} samples/s/chip",
              file=sys.stderr)

    if args.model_id:
        # bf16 sample QUALITY on a trained model: SW(bf16 samples, fp32
        # samples) read against the fp32-vs-fp32 independent-key floor.
        from fdtpu.metrics import SlicedWasserstein
        from fdtpu.train import get_best_checkpoint, load_checkpoint

        ckpt = get_best_checkpoint(
            Path(__file__).resolve().parent.parent
            / "lightning_logs" / args.model_id / "checkpoints"
        )
        m32 = load_checkpoint(ckpt, attention_impl="blockdiag")
        m16 = load_checkpoint(
            ckpt, attention_impl="blockdiag", compute_dtype="bfloat16"
        )
        s32 = DiffusionSampler(m32, sample_batch_size=args.batch).sample(
            args.batch, args.steps, key=jax.random.PRNGKey(1)
        )
        s32b = DiffusionSampler(m32, sample_batch_size=args.batch).sample(
            args.batch, args.steps, key=jax.random.PRNGKey(2)
        )
        s16 = DiffusionSampler(m16, sample_batch_size=args.batch).sample(
            args.batch, args.steps, key=jax.random.PRNGKey(2)
        )
        sw = SlicedWasserstein(
            original_samples=np.asarray(s32), random_seed=42, num_directions=200
        )
        floor = float(sw(np.asarray(s32b))["sliced_wasserstein_mean"])
        d16 = float(sw(np.asarray(s16))["sliced_wasserstein_mean"])
        # Keyed by model so several trained models can coexist in the JSON;
        # --flagship selects the unsuffixed keys the docs headline uses.
        suffix = "" if args.flagship else f"@{args.model_id}"
        results["bf16_quality" + suffix] = {
            "model_id": args.model_id,
            "sw_bf16_vs_fp32": d16,
            "sw_fp32_noise_floor": floor,
            "within_floor": d16 <= 1.25 * floor,
        }
        print(f"bf16 quality: SW {d16:.3f} vs fp32 floor {floor:.3f}",
              file=sys.stderr)

        if suffix:
            # Non-flagship model: record its own uncached timings too (the
            # flagship's live in the variant table above).
            for name, m in (
                ("uncached_fp32" + suffix, m32), ("uncached_bf16" + suffix, m16)
            ):
                t, sps = measure(
                    DiffusionSampler(m, sample_batch_size=args.batch),
                    args.batch, args.steps,
                )
                results[name] = {"time_s": t, "samples_per_s_chip": sps,
                                 "batch": args.batch, "steps": args.steps}
                print(f"{name:<28} {t:7.2f}s  {sps:7.1f} samples/s/chip",
                      file=sys.stderr)

        # Cached (score-level E²-CRF) absolute throughput per dtype: skip
        # steps are EM-bound either way; bf16 accelerates the full steps.
        cache_kwargs = {"level": "score", "R": 100, "tau_0": 1.0, "eps_order": 1}
        for name, m in (("cached_fp32" + suffix, m32), ("cached_bf16" + suffix, m16)):
            sampler = DiffusionSampler(
                m, sample_batch_size=args.batch, use_cache=True,
                cache_kwargs=dict(cache_kwargs),
            )
            t, sps = measure(sampler, args.batch, args.steps)
            stats = sampler.get_cache_stats()
            results[name] = {
                "time_s": t, "samples_per_s_chip": sps,
                "steps_skipped_ratio": stats["steps_skipped_ratio"],
                "batch": args.batch, "steps": args.steps,
            }
            print(f"{name:<18} {t:7.2f}s  {sps:7.1f} samples/s/chip "
                  f"({100 * stats['steps_skipped_ratio']:.0f}% skipped)",
                  file=sys.stderr)

    out.parent.mkdir(parents=True, exist_ok=True)
    config = {
        "batch": args.batch, "steps": args.steps, "max_len": args.max_len,
        "model": "flagship d72/L10/H12 (+ d128/H16 reference)",
    }
    # Merge into the existing document: the frontier/model_scaling modes own
    # their own top-level sections and must survive a plain variant run.
    payload = json.loads(out.read_text()) if out.exists() else {}
    if args.quality_only and payload.get("config"):
        # Partial (quality-only) runs keep the full-run config that
        # describes the variant timings stored alongside.
        config = payload["config"]
    payload["config"] = config
    payload["results"] = results
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
