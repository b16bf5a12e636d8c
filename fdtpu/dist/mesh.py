"""Device mesh + sharding utilities — the framework's communication backend.

The reference has **no** distributed machinery (SURVEY.md §2.3-2.4: no DDP,
no NCCL/MPI; single-process Lightning).  The TPU-native equivalent is this
module: a `jax.sharding.Mesh` over the chips, `NamedSharding` specs for the
batch axis, and XLA-inserted collectives over ICI/DCN.  Training and sampling
are data-parallel over the batch axis (the only axis with real payoff at
≤512-token sequences — SURVEY.md §5.7); the mesh also carries an optional
``model`` axis for tensor-parallel experiments.

Multi-host: call `jax.distributed.initialize()` before `create_mesh` and the
same code spans hosts (DCN between slices, ICI within).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh layout: ``data`` shards the batch axis, ``model`` is reserved for
    tensor parallelism (default 1 — the score nets are ~3 M params)."""

    data: int = -1  # -1 → all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"Mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def create_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    config = config or MeshConfig()
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a batch pytree with its leading axis sharded over 'data'.

    The batch's leading dim must be divisible by the data-axis size.
    """

    def put(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, data_sharding(mesh, x.ndim))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        return jax.device_put(jax.numpy.asarray(x), sharding)

    return jax.tree.map(put, tree)


def tp_param_spec(path: tuple, leaf: Any) -> P:
    """Megatron-style tensor-parallel PartitionSpec for a score-model param.

    Column-parallel QKV/FFN-in (shard the output-feature axis over
    ``model``), row-parallel attention-out/FFN-out (shard the contracting
    axis — XLA inserts the psum over ICI).  Applies to the stacked
    per-layer trees produced by ``init_score_model`` (leading ``L`` axis);
    everything else (embeddings, norms, biases of row-parallel layers)
    stays replicated.
    """
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    last = keys[-1] if keys else None
    if "attn" in keys:
        if last == "in_proj_w":
            return P(None, None, "model")  # (L, D, 3D): column-parallel
        if last == "in_proj_b":
            return P(None, "model")
        if last == "out_w":
            return P(None, "model", None)  # (L, D, D): row-parallel
        return P()
    if "linear1" in keys:
        if last == "w":
            return P(None, None, "model")  # (L, D, F): column-parallel
        if last == "b":
            return P(None, "model")
    if "linear2" in keys and last == "w":
        return P(None, "model", None)  # (L, F, D): row-parallel
    return P()


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree on the mesh: tensor-parallel specs over the
    ``model`` axis when it has >1 device, fully replicated otherwise.

    Optimizer state built from these arrays (``tx.init``) inherits the
    placements, so the whole train state is sharded consistently.
    """
    if mesh.shape.get("model", 1) <= 1:
        return replicate(mesh, params)
    return jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(
            jax.numpy.asarray(x), NamedSharding(mesh, tp_param_spec(path, x))
        ),
        params,
    )


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the batch axis up to a multiple (for even sharding); returns
    (padded, original_size)."""
    n = batch.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = np.repeat(batch[:1], rem, axis=0)
    return np.concatenate([batch, pad], axis=0), n
