"""Migration from reference PyTorch checkpoints.

Converts a reference `ScoreModule` Lightning state dict
(`/root/reference/src/fdiff/models/score_models.py:24-360`) into fdtpu
variables, so users of the torch implementation can load their trained
models directly.  torch is only required when these functions are called.

Mapping (torch module → fdtpu param tree):
    embedder.{weight,bias}                  → params.embedder.{w^T, b}
    pos_encoder.embedding.weight            → params.pos_encoder.embedding
    time_encoder.W                          → constants.time_encoder.W
    time_encoder.dense.{weight,bias}        → params.time_encoder.{dense_w^T, dense_b}
    backbone.layers.{i}.self_attn.in_proj_* → params.backbone.attn.in_proj_{w^T, b}[i]
    backbone.layers.{i}.self_attn.out_proj.*→ params.backbone.attn.out_{w^T, b}[i]
    backbone.layers.{i}.linear{1,2}.*       → params.backbone.linear{1,2}.{w^T, b}[i]
    backbone.layers.{i}.norm{1,2}.*         → params.backbone.ln{1,2}.{scale,bias}[i]
    unembedder.{weight,bias}                → params.unembedder.{w^T, b}
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np

from fdtpu.models.score_models import ScoreModelConfig


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x,
                      dtype=np.float32)


def convert_torch_state_dict(
    state_dict: Mapping[str, Any], cfg: ScoreModelConfig
) -> dict[str, Any]:
    """Reference transformer `ScoreModule` state dict → fdtpu variables."""
    assert cfg.backbone == "transformer", "conversion implemented for the transformer backbone"
    sd = {k: _t(v) for k, v in state_dict.items()}

    params: dict[str, Any] = {
        "embedder": {"w": sd["embedder.weight"].T, "b": sd["embedder.bias"]},
        "unembedder": {"w": sd["unembedder.weight"].T, "b": sd["unembedder.bias"]},
        "pos_encoder": {"embedding": sd["pos_encoder.embedding.weight"]},
        "time_encoder": {
            "dense_w": sd["time_encoder.dense.weight"].T,
            "dense_b": sd["time_encoder.dense.bias"],
        },
    }
    constants = {"time_encoder": {"W": sd["time_encoder.W"]}}

    layers = []
    for i in range(cfg.num_layers):
        pre = f"backbone.layers.{i}."
        layers.append(
            {
                "attn": {
                    "in_proj_w": sd[pre + "self_attn.in_proj_weight"].T,
                    "in_proj_b": sd[pre + "self_attn.in_proj_bias"],
                    "out_w": sd[pre + "self_attn.out_proj.weight"].T,
                    "out_b": sd[pre + "self_attn.out_proj.bias"],
                },
                "linear1": {"w": sd[pre + "linear1.weight"].T, "b": sd[pre + "linear1.bias"]},
                "linear2": {"w": sd[pre + "linear2.weight"].T, "b": sd[pre + "linear2.bias"]},
                "ln1": {"scale": sd[pre + "norm1.weight"], "bias": sd[pre + "norm1.bias"]},
                "ln2": {"scale": sd[pre + "norm2.weight"], "bias": sd[pre + "norm2.bias"]},
            }
        )
    params["backbone"] = {
        outer: {
            inner: np.stack([layer[outer][inner] for layer in layers])
            for inner in layers[0][outer]
        }
        for outer in layers[0]
    }
    return {"params": params, "constants": constants}


def load_reference_checkpoint(
    ckpt_path: Path | str, cfg: ScoreModelConfig
) -> dict[str, Any]:
    """Load a reference Lightning ``.ckpt`` file and convert its weights.

    Uses ``weights_only=False`` torch loading with a tolerant unpickler so
    the pickled Lightning/scheduler objects in the checkpoint don't require
    those packages to be installed.
    """
    import io
    import pickle

    import torch

    class _Tolerant(pickle.Unpickler):
        def find_class(self, module, name):  # noqa: D401
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (), {"__setstate_": None})

    try:
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    except (ImportError, ModuleNotFoundError, AttributeError, pickle.UnpicklingError):
        with open(ckpt_path, "rb") as f:
            data = f.read()
        ckpt = torch.load(
            io.BytesIO(data), map_location="cpu", weights_only=False,
            pickle_module=type("M", (), {"Unpickler": _Tolerant, "load": pickle.load}),
        )
    state_dict = ckpt.get("state_dict", ckpt)
    return convert_torch_state_dict(state_dict, cfg)
