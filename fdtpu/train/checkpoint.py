"""Checkpointing: Orbax params + JSON config snapshot (no pickling).

The reference pickles the whole LightningModule incl. the scheduler object
into ``.ckpt`` files, forcing ``weights_only=False`` + ``add_safe_globals``
workarounds (reference cmd/benchmark_cache.py:25-26, SURVEY.md §5.4).  Here a
checkpoint is a directory ``epoch=N-val_loss=X.ckpt/`` containing an Orbax
pytree of the variables plus ``meta.json`` with the model/scheduler configs,
from which everything is reconstructed — cleaner and safe.
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from fdtpu.diffusion.sde import SDE, VEScheduler, VPScheduler
from fdtpu.models.score_models import ScoreModel, ScoreModelConfig

SCHEDULER_REGISTRY = {"VPScheduler": VPScheduler, "VEScheduler": VEScheduler}


def scheduler_to_meta(scheduler: SDE) -> dict[str, Any]:
    meta = {
        "class": type(scheduler).__name__,
        "fourier_noise_scaling": scheduler.fourier_noise_scaling,
        "eps": scheduler.eps,
    }
    if isinstance(scheduler, VPScheduler):
        meta.update(beta_min=scheduler.beta_min, beta_max=scheduler.beta_max)
    elif isinstance(scheduler, VEScheduler):
        meta.update(sigma_min=scheduler.sigma_min, sigma_max=scheduler.sigma_max)
    return meta


def scheduler_from_meta(meta: dict[str, Any], max_len: int) -> SDE:
    cls = SCHEDULER_REGISTRY[meta["class"]]
    kwargs = {k: v for k, v in meta.items() if k != "class"}
    kwargs = {
        k: jax.numpy.asarray(v) if k in ("beta_min", "beta_max", "sigma_min", "sigma_max") else v
        for k, v in kwargs.items()
    }
    # Scalar hyperparameters stay python floats (traced leaves elsewhere).
    kwargs = {k: float(v) if hasattr(v, "item") else v for k, v in kwargs.items()}
    return cls(**kwargs).with_noise_scaling(max_len)


def save_checkpoint(
    run_dir: Path, model: ScoreModel, epoch: int, val_loss: float
) -> Path:
    ckpt_dir = run_dir / "checkpoints" / f"epoch={epoch}-val_loss={val_loss:.2f}.ckpt"
    ckpt_dir.parent.mkdir(parents=True, exist_ok=True)

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            (ckpt_dir / "variables").absolute(),
            jax.device_get(model.variables),
            force=True,
        )

    meta = {
        "epoch": epoch,
        "val_loss": val_loss,
        "model_config": dataclasses.asdict(model.config),
        "scheduler": scheduler_to_meta(model.scheduler),
        "num_training_steps": model.num_training_steps,
        "lr_max": model.lr_max,
        "likelihood_weighting": model.likelihood_weighting,
    }
    with open(ckpt_dir / "meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return ckpt_dir


def load_checkpoint(ckpt_dir: Path, **config_overrides: Any) -> ScoreModel:
    """Restore a checkpoint; ``config_overrides`` replace ScoreModelConfig
    fields that are runtime choices rather than part of the weights (e.g.
    ``attention_impl="auto"`` to pick the fused kernel on the current
    hardware, or ``compute_dtype``)."""
    ckpt_dir = Path(ckpt_dir)
    with open(ckpt_dir / "meta.json") as f:
        meta = json.load(f)
    config = ScoreModelConfig(**{**meta["model_config"], **config_overrides})

    # Restore with a concrete target so dtypes/shapes are validated.
    from fdtpu.models.score_models import init_score_model

    template = jax.eval_shape(
        lambda: init_score_model(jax.random.PRNGKey(0), config)
    )
    template = jax.tree.map(
        lambda s: np.zeros(s.shape, s.dtype), template
    )
    with ocp.StandardCheckpointer() as ckptr:
        variables = ckptr.restore((ckpt_dir / "variables").absolute(), template)

    scheduler = scheduler_from_meta(meta["scheduler"], config.max_len)
    return ScoreModel(
        config=config,
        variables=variables,
        scheduler=scheduler,
        num_training_steps=meta.get("num_training_steps", 1000),
        lr_max=meta.get("lr_max", 1e-3),
        likelihood_weighting=meta.get("likelihood_weighting", False),
    )


def save_train_state(
    run_dir: Path,
    state: Any,
    key: jax.Array,
    epoch: int,
    global_step: int,
    best_val_loss: float,
) -> Path:
    """Mid-training resume snapshot: full TrainState (params + optimizer
    state + step) and the trainer's PRNG key, overwritten each epoch.

    Beyond the reference (its Lightning setup never resumes mid-training,
    SURVEY.md §5.4) — this is the TPU-preemption story: restoring the
    snapshot reproduces the uninterrupted run exactly (same data order,
    same PRNG stream, same optimizer trajectory)."""
    resume_dir = Path(run_dir) / "resume"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            (resume_dir / "state").absolute(),
            {"state": jax.device_get(state), "key": jax.device_get(key)},
            force=True,
        )
    with open(resume_dir / "meta.json", "w") as f:
        json.dump(
            {
                "epoch": epoch,
                "global_step": global_step,
                "best_val_loss": best_val_loss,
            },
            f,
        )
    return resume_dir


def load_train_state(
    run_dir: Path, state_template: Any, key_template: jax.Array
) -> Optional[tuple[Any, jax.Array, dict[str, Any]]]:
    """Restore a :func:`save_train_state` snapshot, or None if absent.

    ``state_template``/``key_template``: concrete pytrees with the target
    structure (a freshly initialized TrainState and PRNGKey)."""
    resume_dir = Path(run_dir) / "resume"
    if not (resume_dir / "meta.json").exists():
        return None
    with open(resume_dir / "meta.json") as f:
        meta = json.load(f)
    template = {
        "state": jax.device_get(state_template),
        "key": jax.device_get(key_template),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore((resume_dir / "state").absolute(), template)
    return restored["state"], jax.numpy.asarray(restored["key"]), meta


def get_best_checkpoint(checkpoint_path: Path) -> Path:
    """Lowest-val-loss checkpoint by filename (reference extraction.py:79-98)."""
    pattern = r"epoch=(\d+)-val_loss=(-?\d+\.\d+)\.ckpt"
    best_key: Optional[tuple[float, int]] = None
    best: Optional[Path] = None
    for ckpt in Path(checkpoint_path).glob("*.ckpt"):
        match = re.search(pattern, ckpt.name)
        if match is None:
            continue
        # The filename loss is rounded to 2 decimals; ties go to the later
        # epoch (the tracker only saves on strict improvement, so among
        # equal rounded losses the latest epoch is the true best).
        key = (float(match.group(2)), -int(match.group(1)))
        if best_key is None or key < best_key:
            best_key = key
            best = ckpt
    if best is None:
        raise FileNotFoundError(f"No checkpoints found in {checkpoint_path}")
    return best
