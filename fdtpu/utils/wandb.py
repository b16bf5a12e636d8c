"""Optional Weights & Biases bootstrap (reference `/root/reference/src/fdiff/utils/wandb.py`).

``maybe_initialize_wandb`` starts a run iff wandb is installed and enabled in
the config; returns the run id used as the experiment directory name
(reference wandb.py:8-33, honoring WANDB_ENTITY / WANDB_MODE env vars).
Everything degrades gracefully without the package — runs then get a
timestamp id and metrics go to the run dir's JSONL log only.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Optional

from fdtpu.utils.config import flatten_config


def maybe_initialize_wandb(cfg: dict[str, Any]) -> Optional[str]:
    """Returns the run id (wandb id when active, timestamp otherwise)."""
    use_wandb = bool(cfg.get("use_wandb", False))
    if not use_wandb:
        return None
    try:
        import wandb
    except ImportError:
        logging.warning("use_wandb=true but wandb is not installed; continuing without it.")
        return None
    run = wandb.init(
        project=cfg.get("wandb_project", "FourierDiffusion"),
        entity=os.environ.get("WANDB_ENTITY"),
        mode=os.environ.get("WANDB_MODE", "online"),
        config=flatten_config(cfg),
    )
    return run.id


def maybe_log_wandb(record: dict[str, Any]) -> None:
    """Forward a metrics record to an active wandb run, if any."""
    try:
        import wandb

        if wandb.run is not None:
            wandb.log(record)
    except ImportError:
        pass


def maybe_log_model(ckpt_path: Any, name: str = "model") -> None:
    """Upload a checkpoint directory/file as a wandb model artifact — the
    analog of the reference's ``WandbLogger(log_model=True)``
    (conf/trainer/default.yaml:6-8).  No-op without an active run."""
    try:
        import wandb
    except ImportError:  # optional dependency: silently degrade
        return
    try:
        if wandb.run is None:
            return
        import os as _os

        artifact = wandb.Artifact(f"{name}-{wandb.run.id}", type="model")
        path = str(ckpt_path)
        if _os.path.isdir(path):
            artifact.add_dir(path)
        else:
            artifact.add_file(path)
        wandb.run.log_artifact(artifact)
    except Exception as exc:  # best-effort, like maybe_log_wandb above:
        # an upload failure (network, quota, fs race) must not kill the
        # training run that just produced a new best checkpoint.
        if isinstance(exc, KeyboardInterrupt):
            raise
        logging.getLogger(__name__).warning(
            "wandb model-artifact upload failed (continuing): %s", exc
        )


def run_id_or_timestamp(run_id: Optional[str]) -> str:
    return run_id if run_id else time.strftime("%Y%m%d_%H%M%S")
