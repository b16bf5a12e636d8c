#!/usr/bin/env python
"""Export a trained run's compiled sampling program for serving.

Usage:
    python cli/export_sampler.py model_id=<run_id> \\
        [sample_batch_size=128 num_diffusion_steps=1000 use_cache=true \\
         +cache_kwargs.level=score out=/path/sampler.stablehlo]

Restores the run's best checkpoint, builds the (optionally E²-CRF-cached)
sampler, and serializes the whole reverse-diffusion program — weights baked
in — as a StableHLO artifact via ``fdtpu.serve.export_sampler``.  The
artifact runs under any compatible JAX runtime with no fdtpu code:

    from fdtpu.serve import load_exported   # or inline jax.export calls
    fn = load_exported("sampler.stablehlo")
    samples = fn(jax.random.PRNGKey(0))

No reference analog: the reference deploys by re-running cmd/sample.py
with the full Python/torch stack.
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

import jax

if os.environ.get("FDTPU_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FDTPU_PLATFORM"])

from fdtpu.sampling import DiffusionSampler
from fdtpu.serve import export_sampler
from fdtpu.train import get_best_checkpoint, load_checkpoint
from fdtpu.utils.builders import resolve_model_dir
from fdtpu.utils.config import compose_config

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    cfg = compose_config(CONFIG_DIR, "export", sys.argv[1:])
    model_dir = resolve_model_dir(cfg["model_path"], cfg["model_id"])
    ckpt = get_best_checkpoint(model_dir / "checkpoints")
    logging.info("Exporting checkpoint %s", ckpt)

    overrides = {
        k: cfg[k] for k in ("attention_impl", "compute_dtype") if cfg.get(k)
    }
    model = load_checkpoint(ckpt, **overrides)

    sampler = DiffusionSampler(
        model,
        sample_batch_size=int(cfg["sample_batch_size"]),
        use_cache=bool(cfg.get("use_cache", False)),
        cache_kwargs=dict(cfg.get("cache_kwargs") or {}),
    )
    out = Path(cfg["out"]) if cfg.get("out") else (
        model_dir / "export" / "sampler.stablehlo"
    )
    platforms = cfg.get("platforms")
    meta = export_sampler(
        sampler,
        num_diffusion_steps=int(cfg["num_diffusion_steps"]),
        path=out,
        platforms=list(platforms) if platforms else None,
    )
    logging.info("wrote %s (%d bytes)", out, out.stat().st_size)
    print(json.dumps({"path": str(out), **meta}))


if __name__ == "__main__":
    main()
