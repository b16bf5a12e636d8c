"""AOT export of compiled sampling programs for production serving.

The reference framework deploys by shipping Python + torch + a checkpoint
and re-running ``cmd/sample.py`` (reference sampler.py:105-215).  fdtpu
additionally supports exporting a **fully compiled, self-contained
sampling program** — weights baked in as constants, the whole reverse
diffusion (optionally E²-CRF-cached) as one StableHLO computation — via
``jax.export``.  The serialized artifact can be loaded and executed by any
compatible JAX runtime without the model code or checkpoint files, and is
covered by jax.export's cross-version compatibility guarantees (forward
compatibility window for serialized StableHLO).

Contract: the exported function maps a PRNG key to one batch of samples,

    fn(key: uint32[2]) -> float32[batch, max_len, n_channels]

with the same values as ``DiffusionSampler.sample(batch, steps, key)``
produces for its first batch (same key split, same prior, same chain,
fresh cache) — tested in tests/test_serve.py.  Precision note: two
separately compiled programs of the same chain differ by ~3e-5/element
per step (XLA fusion jitter, see CLAUDE.md), which the reverse-diffusion
trajectory amplifies over long chains — e.g. ~1% of sample magnitude
after 50 steps on TPU/bf16 with random weights (verified on-chip, Pallas
kernel baked in; 12.8 MB artifact for the flagship).  This is the normal
distance between any two compilations, not an export artifact: the
exported program is bit-exact against a direct ``jax.jit`` of the same
closure.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from fdtpu.sampling.sampler import DiffusionSampler, sample_chain

Array = jax.Array


def make_sampling_fn(
    sampler: DiffusionSampler, num_diffusion_steps: int
) -> Callable[[Array], Array]:
    """Build the pure ``(key) -> samples`` closure for one sampler batch.

    Mirrors the first batch of :meth:`DiffusionSampler.sample` (key split
    → prior sample → fresh cache → :func:`sample_chain`), with the model
    variables captured as closure constants so the exported program is
    self-contained.
    """
    batch = sampler.sample_batch_size

    def fn(key: Array) -> Array:
        _, k_prior, k_chain = jax.random.split(key, 3)
        x0 = sampler.sample_prior(k_prior, batch)
        cache_state = sampler._init_cache(batch)
        x, _ = sample_chain(
            sampler.score_model.variables,
            sampler.noise_scheduler,
            x0,
            k_chain,
            cache_state,
            model_cfg=sampler.score_model.config,
            cache_cfg=sampler.cache_config,
            num_steps=num_diffusion_steps,
            use_fresca=sampler.use_fresca,
            fresca_low_scale=sampler.fresca_low_scale,
            fresca_high_scale=sampler.fresca_high_scale,
            fresca_cutoff_ratio=sampler.fresca_cutoff_ratio,
            fresca_cutoff_strategy=sampler.fresca_cutoff_strategy,
        )
        return x

    return fn


def export_sampler(
    sampler: DiffusionSampler,
    num_diffusion_steps: int,
    path: str | Path,
    platforms: Optional[list[str]] = None,
) -> dict[str, Any]:
    """Serialize a compiled sampling program to ``path`` (+ ``.json`` meta).

    ``platforms``: target platforms for the lowering (e.g. ``["tpu"]``);
    defaults to the current backend.  Note the Pallas blockdiag kernel only
    lowers for TPU — export einsum-attention configs for CPU targets
    (``attention_impl="auto"`` resolves per the *exporting* backend).

    Returns the metadata dict (also written to ``<path>.json``).
    """
    path = Path(path)
    fn = make_sampling_fn(sampler, num_diffusion_steps)
    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
    exported = jax.export.export(jax.jit(fn), platforms=platforms)(key_spec)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(exported.serialize())

    cfg = sampler.score_model.config
    meta: dict[str, Any] = {
        "format": "jax.export/stablehlo",
        "calling_convention": exported.calling_convention_version,
        "platforms": list(exported.platforms),
        "input": {"key": "uint32[2]"},
        "output": {
            "samples": (
                f"float32[{sampler.sample_batch_size}, {cfg.max_len}, "
                f"{cfg.n_channels}]"
            )
        },
        "num_diffusion_steps": num_diffusion_steps,
        "sample_batch_size": sampler.sample_batch_size,
        "model": {
            "d_model": cfg.d_model,
            "num_layers": cfg.num_layers,
            "n_head": cfg.n_head,
            "max_len": cfg.max_len,
            "n_channels": cfg.n_channels,
            "backbone": cfg.backbone,
        },
        "use_cache": sampler.use_cache,
        "cache_kwargs": (
            {
                "level": sampler.cache_config.level,
                "policy": sampler.cache_config.policy,
                "R": sampler.cache_config.R,
                "tau_0": sampler.cache_config.tau_0,
            }
            if sampler.use_cache
            else None
        ),
    }
    Path(f"{path}.json").write_text(json.dumps(meta, indent=2))
    return meta


def load_exported(path: str | Path) -> Callable[[Array], Array]:
    """Load a serialized sampling program; returns ``fn(key) -> samples``.

    Needs only jax — no fdtpu model code, config, or checkpoint."""
    exported = jax.export.deserialize(Path(path).read_bytes())

    def fn(key: Array) -> Array:
        return exported.call(jnp.asarray(key, jnp.uint32))

    return fn
