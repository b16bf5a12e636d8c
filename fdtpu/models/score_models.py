"""Score networks: transformer (flagship), MLP and LSTM backbones.

TPU-native redesign of `/root/reference/src/fdiff/models/score_models.py`.
Key design departures from the torch reference:

* Pure functional: ``init_score_model(key, cfg) -> variables`` and
  ``score_apply(variables, cfg, x, t, ...) -> score``; no module state, so the
  whole network traces into the jitted train step and the `lax.scan` sampler.
* The transformer layer stack runs as a `lax.scan` over stacked layer
  parameters — one compiled layer body regardless of depth, with the per-layer
  KV cache ``(L, B, T, H, Dh)`` riding the same scan (reference loops Python
  modules, score_models.py:178-194).
* Cached forwards return the per-layer hidden states (CRF) used by the E²-CRF
  event policy (reference `_forward_with_cache`, score_models.py:121-194).

Pipeline parity (reference score_models.py:79-119): Linear(C→D) embed →
learnable positional encoding → Gaussian-Fourier time encoding → backbone →
Linear(D→C) unembed.  Config defaults follow cmd/conf/score_model/*.yaml
(d_model=72, num_layers=10, n_head=12 ≈ 3.2M params).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from fdtpu.models.encodings import (
    apply_gaussian_fourier_projection,
    apply_positional_encoding,
    init_gaussian_fourier_projection,
    init_positional_encoding,
)
from fdtpu.models.initializers import linear_init
from fdtpu.models.transformer import (
    MODE_CACHED,
    MODE_FULL,
    MODE_MIXED,
    encoder_layer_apply,
    encoder_layer_topk,
    init_encoder_layer,
)

Array = jax.Array
Params = dict[str, Any]


@dataclasses.dataclass
class ScoreModel:
    """Bundle of (config, variables, scheduler) — the functional analog of the
    reference's LightningModule `ScoreModule` (score_models.py:24-360).

    Everything stateful lives in `variables`; the methods are thin wrappers
    over the pure apply functions below.
    """

    config: "ScoreModelConfig"
    variables: dict[str, Any]
    scheduler: Any  # fdtpu.diffusion.sde.SDE
    num_training_steps: int = 1000
    lr_max: float = 1e-3
    likelihood_weighting: bool = False

    @property
    def n_channels(self) -> int:
        return self.config.n_channels

    @property
    def max_len(self) -> int:
        return self.config.max_len

    def __call__(self, x: Array, timesteps: Array, **kw) -> Array:
        return score_apply(self.variables, self.config, x, timesteps, **kw)

    def apply_cached(self, x, timesteps, kv_cache, recompute_mask, mode):
        return score_apply_cached(
            self.variables, self.config, x, timesteps, kv_cache, recompute_mask, mode
        )

    def param_count(self) -> int:
        return param_count(self.variables)


@dataclasses.dataclass(frozen=True)
class ScoreModelConfig:
    """Static architecture config (hashable; safe as a jit static arg)."""

    n_channels: int
    max_len: int
    d_model: int = 72
    num_layers: int = 10
    n_head: int = 12
    dim_feedforward: int = 2048
    dropout: float = 0.1
    ln_eps: float = 1e-5
    backbone: str = "transformer"  # "transformer" | "mlp" | "lstm"
    d_mlp: int = 1024
    gfp_scale: float = 30.0
    # Attention implementation for the uncached forward: "einsum" (XLA),
    # "blockdiag" (Pallas fused kernel packing all heads into two large MXU
    # matmuls — faster for tiny heads on TPU; cached paths always use einsum),
    # or "auto" (blockdiag on accelerators when head_dim < 16, the measured
    # crossover — see resolve_attention_impl).
    attention_impl: str = "einsum"
    # Mixed precision: run the backbone in this dtype (params stay float32;
    # the score output is always float32).  "bfloat16" roughly halves the
    # forward latency on TPU at this model scale.
    compute_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_head

    @property
    def _cdtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


# ----------------------------------------------------------------- init
def _stack_layers(layer_params: list[Params]) -> Params:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def init_score_model(key: Array, cfg: ScoreModelConfig) -> dict[str, Params]:
    """Initialize all variables: {"params": trainable, "constants": frozen}."""
    k_embed, k_unembed, k_pos, k_time, k_layers = jax.random.split(key, 5)

    params: Params = {}
    constants: Params = {}

    gfp_params, gfp_constants = init_gaussian_fourier_projection(
        k_time, cfg.d_model, cfg.gfp_scale
    )
    params["time_encoder"] = gfp_params
    constants["time_encoder"] = gfp_constants

    if cfg.backbone == "mlp":
        # Flattened (T·C) embedding, no positional encoding
        # (reference MLPScoreModule, score_models.py:363-440).
        w, b = linear_init(k_embed, cfg.max_len * cfg.n_channels, cfg.d_model)
        params["embedder"] = {"w": w, "b": b}
        w, b = linear_init(k_unembed, cfg.d_model, cfg.max_len * cfg.n_channels)
        params["unembedder"] = {"w": w, "b": b}
        layer_keys = jax.random.split(k_layers, cfg.num_layers)
        layers = []
        for lk in layer_keys:
            k1, k2 = jax.random.split(lk)
            w1, b1 = linear_init(k1, cfg.d_model, cfg.d_mlp)
            w2, b2 = linear_init(k2, cfg.d_mlp, cfg.d_model)
            layers.append(
                {"linear1": {"w": w1, "b": b1}, "linear2": {"w": w2, "b": b2}}
            )
        params["backbone"] = _stack_layers(layers)
        return {"params": params, "constants": constants}

    w, b = linear_init(k_embed, cfg.n_channels, cfg.d_model)
    params["embedder"] = {"w": w, "b": b}
    w, b = linear_init(k_unembed, cfg.d_model, cfg.n_channels)
    params["unembedder"] = {"w": w, "b": b}

    if cfg.backbone == "lstm":
        # Residual unidirectional LSTM stack (reference LSTMScoreModule,
        # score_models.py:443-511); torch gate order (i, f, g, o) and
        # U(±1/√H) init.
        layer_keys = jax.random.split(k_layers, cfg.num_layers)
        layers = []
        h = cfg.d_model
        bound = 1.0 / jnp.sqrt(jnp.asarray(h, dtype=jnp.float32))
        for lk in layer_keys:
            ks = jax.random.split(lk, 4)
            layers.append(
                {
                    "w_ih": jax.random.uniform(ks[0], (h, 4 * h), jnp.float32, -bound, bound),
                    "w_hh": jax.random.uniform(ks[1], (h, 4 * h), jnp.float32, -bound, bound),
                    "b_ih": jax.random.uniform(ks[2], (4 * h,), jnp.float32, -bound, bound),
                    "b_hh": jax.random.uniform(ks[3], (4 * h,), jnp.float32, -bound, bound),
                }
            )
        params["backbone"] = _stack_layers(layers)
        return {"params": params, "constants": constants}

    # transformer (default)
    params["pos_encoder"] = init_positional_encoding(k_pos, cfg.d_model, cfg.max_len)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    params["backbone"] = _stack_layers(
        [init_encoder_layer(lk, cfg.d_model, cfg.dim_feedforward) for lk in layer_keys]
    )
    return {"params": params, "constants": constants}


def param_count(variables: dict[str, Params]) -> int:
    return sum(x.size for x in jax.tree.leaves(variables["params"]))


# ----------------------------------------------------------------- backbones
def resolve_attention_impl(impl: str, head_dim: int = 0) -> str:
    """Resolve ``"auto"`` at trace time: the fused Pallas block-diagonal
    kernel on accelerators *when heads are tiny*, XLA einsum otherwise
    (and always on CPU — no Pallas backend there).  The choice is a
    hardware/shape property, not part of the trained model — a checkpoint
    trained with ``auto`` picks the right kernel wherever it is later
    loaded.

    The head_dim<16 crossover is measured (throughput.json
    ``model_scaling``): the kernel packs per-head blocks into two large
    MXU matmuls, which wins 1.3-1.4x at head_dim 6-8 but loses ~13-21% to
    plain einsum at head_dim 16-32, where XLA already tiles the MXU well
    and the block-diagonal packing only adds zero-padding FLOPs."""
    if impl == "auto":
        if jax.default_backend() == "cpu" or head_dim >= 16:
            return "einsum"
        return "blockdiag"
    return impl


def _transformer_backbone(
    params: Params,
    cfg: ScoreModelConfig,
    h: Array,
    *,
    train: bool,
    dropout_key: Optional[Array],
    kv_cache: Optional[tuple[Array, Array]] = None,
    recompute_mask: Optional[Array] = None,
    mode: int = MODE_FULL,
    attention_impl: str = "einsum",
) -> tuple[Array, tuple[Array, Array], Array]:
    """Scan the encoder layers.  Returns (h, (k, v) stacked (L,B,T,H,Dh), crf).

    crf is the per-layer hidden state of batch element 0, ``(L, T, D)``
    (reference stores h[0].detach() per layer, score_models.py:183-190).
    """
    num_layers = cfg.num_layers
    attention_impl = resolve_attention_impl(attention_impl, cfg.head_dim)
    if dropout_key is not None:
        layer_keys = jax.random.split(dropout_key, num_layers)
    else:
        layer_keys = jnp.zeros((num_layers, 2), dtype=jnp.uint32)
    has_dropout = dropout_key is not None

    if kv_cache is None:
        b, t = h.shape[0], h.shape[1]
        kv_cache = (
            jnp.zeros((num_layers, b, t, cfg.n_head, cfg.head_dim), h.dtype),
            jnp.zeros((num_layers, b, t, cfg.n_head, cfg.head_dim), h.dtype),
        )
    if recompute_mask is None:
        recompute_mask = jnp.ones((h.shape[1],), dtype=bool)

    def body(carry, xs):
        hidden = carry
        layer_p, k_in, v_in, dkey = xs
        hidden, (k_out, v_out) = encoder_layer_apply(
            layer_p,
            hidden,
            cfg.n_head,
            dropout=cfg.dropout,
            ln_eps=cfg.ln_eps,
            train=train,
            dropout_key=dkey if has_dropout else None,
            kv_cache=(k_in, v_in),
            recompute_mask=recompute_mask,
            mode=mode,
            attention_impl=attention_impl,
        )
        return hidden, (k_out, v_out, hidden[0])

    h, (k_new, v_new, crf) = jax.lax.scan(
        body, h, (params["backbone"], kv_cache[0], kv_cache[1], layer_keys)
    )
    return h, (k_new, v_new), crf


def _mlp_backbone(
    params: Params,
    cfg: ScoreModelConfig,
    h: Array,
    *,
    train: bool,
    dropout_key: Optional[Array],
) -> Array:
    """Residual MLP stack, torchvision-MLP semantics (Linear→ReLU→Drop→Linear→Drop)."""
    num_layers = cfg.num_layers
    if dropout_key is not None:
        layer_keys = jax.random.split(dropout_key, num_layers)
    else:
        layer_keys = jnp.zeros((num_layers, 2), dtype=jnp.uint32)
    has_dropout = dropout_key is not None

    def drop(x, key):
        if not train or cfg.dropout <= 0.0 or not has_dropout:
            return x
        keep = 1.0 - cfg.dropout
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)

    def body(carry, xs):
        hidden = carry
        layer_p, dkey = xs
        dk1, dk2 = jax.random.split(dkey) if has_dropout else (dkey, dkey)
        y = jax.nn.relu(hidden @ layer_p["linear1"]["w"] + layer_p["linear1"]["b"])
        y = drop(y, dk1)
        y = y @ layer_p["linear2"]["w"] + layer_p["linear2"]["b"]
        y = drop(y, dk2)
        return hidden + y, None

    h, _ = jax.lax.scan(body, h, (params["backbone"], layer_keys))
    return h


def _lstm_layer(layer_p: Params, x: Array) -> Array:
    """One unidirectional LSTM layer over (B, T, D) via lax.scan over time."""
    b, t, d = x.shape
    h0 = jnp.zeros((b, d), x.dtype)
    c0 = jnp.zeros((b, d), x.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt @ layer_p["w_ih"] + layer_p["b_ih"] + h @ layer_p["w_hh"] + layer_p["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), x.transpose(1, 0, 2))
    return ys.transpose(1, 0, 2)


def _lstm_backbone(params: Params, cfg: ScoreModelConfig, h: Array) -> Array:
    def body(carry, layer_p):
        hidden = carry
        return hidden + _lstm_layer(layer_p, hidden), None

    h, _ = jax.lax.scan(body, h, params["backbone"])
    return h


# ----------------------------------------------------------------- forward
def score_apply(
    variables: dict[str, Params],
    cfg: ScoreModelConfig,
    x: Array,
    timesteps: Array,
    *,
    train: bool = False,
    rngs: Optional[dict[str, Array]] = None,
) -> Array:
    """Uncached score forward: ``(B, max_len, n_channels) → same shape``."""
    params = variables["params"]
    constants = variables["constants"]
    dropout_key = rngs.get("dropout") if (rngs and train) else None

    assert x.shape[1:] == (cfg.max_len, cfg.n_channels), (
        f"X has wrong shape, expected (*, {cfg.max_len}, {cfg.n_channels}), got {x.shape}"
    )

    out_dtype = x.dtype
    if cfg._cdtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(cfg._cdtype), params)
        constants = jax.tree.map(lambda a: a.astype(cfg._cdtype), constants)
        x = x.astype(cfg._cdtype)
        timesteps = timesteps.astype(cfg._cdtype)

    if cfg.backbone == "mlp":
        b = x.shape[0]
        h = x.reshape(b, cfg.max_len * cfg.n_channels)
        h = h @ params["embedder"]["w"] + params["embedder"]["b"]
        h = apply_gaussian_fourier_projection(
            params["time_encoder"], constants["time_encoder"], h, timesteps,
            use_time_axis=False,
        )
        h = _mlp_backbone(params, cfg, h, train=train, dropout_key=dropout_key)
        h = h @ params["unembedder"]["w"] + params["unembedder"]["b"]
        return h.reshape(b, cfg.max_len, cfg.n_channels).astype(out_dtype)

    h = x @ params["embedder"]["w"] + params["embedder"]["b"]
    if cfg.backbone == "transformer":
        h = apply_positional_encoding(params["pos_encoder"], h)
    h = apply_gaussian_fourier_projection(
        params["time_encoder"], constants["time_encoder"], h, timesteps
    )

    if cfg.backbone == "lstm":
        h = _lstm_backbone(params, cfg, h)
    else:
        h, _, _ = _transformer_backbone(
            params, cfg, h, train=train, dropout_key=dropout_key,
            attention_impl=cfg.attention_impl,
        )

    return (h @ params["unembedder"]["w"] + params["unembedder"]["b"]).astype(out_dtype)


def score_apply_topk(
    variables: dict[str, Params],
    cfg: ScoreModelConfig,
    x: Array,
    timesteps: Array,
    kv_cache: tuple[Array, Array],
    idx: Array,
) -> tuple[Array, tuple[Array, Array]]:
    """Token-budget score forward: recompute only the ``idx`` rows end-to-end.

    The static-top-k realization of the reference's per-token recompute sets
    (cached_transformer.py:259-305): gathers the selected token rows through
    embed → positional → time encoding → every encoder layer (query rows,
    fresh K/V scattered into the cache, FFN) → unembed.  FLOP cost per layer
    scales with ``k/T`` for the projections/FFN and ``k·T`` for attention —
    genuinely skipped work, unlike the masked MODE_MIXED path.

    Args:
        kv_cache: ``(k, v)`` each ``(num_layers, B, T, H, Dh)``.
        idx: ``(k_budget,)`` int32 token indices, shared across the batch.

    Returns:
        ``(out_rows, new_kv_cache)`` with out_rows ``(B, k_budget, C)`` — the
        raw network output (score) for the selected tokens.
    """
    assert cfg.backbone == "transformer", "token caching applies to the transformer"
    params = variables["params"]
    constants = variables["constants"]

    out_dtype = x.dtype
    if cfg._cdtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(cfg._cdtype), params)
        constants = jax.tree.map(lambda a: a.astype(cfg._cdtype), constants)
        x = x.astype(cfg._cdtype)
        timesteps = timesteps.astype(cfg._cdtype)
        kv_cache = jax.tree.map(lambda a: a.astype(cfg._cdtype), kv_cache)

    x_rows = jnp.take(x, idx, axis=1)  # (B, k, C)
    h = x_rows @ params["embedder"]["w"] + params["embedder"]["b"]

    # Positional rows (same max-norm-√d lookup as the full path).
    import math as _math

    from fdtpu.models.initializers import max_norm_rows

    table = max_norm_rows(
        params["pos_encoder"]["embedding"], _math.sqrt(cfg.d_model)
    )
    h = h + jnp.take(table, idx, axis=0)[None, :, :]
    h = apply_gaussian_fourier_projection(
        params["time_encoder"], constants["time_encoder"], h, timesteps
    )

    def body(carry, xs):
        hidden = carry
        layer_p, k_in, v_in = xs
        hidden, (k_out, v_out) = encoder_layer_topk(
            layer_p, hidden, (k_in, v_in), idx, cfg.n_head, ln_eps=cfg.ln_eps
        )
        return hidden, (k_out, v_out)

    h, (k_new, v_new) = jax.lax.scan(
        body, h, (params["backbone"], kv_cache[0], kv_cache[1])
    )
    out_rows = (h @ params["unembedder"]["w"] + params["unembedder"]["b"]).astype(
        out_dtype
    )
    return out_rows, (k_new, v_new)


def score_apply_cached(
    variables: dict[str, Params],
    cfg: ScoreModelConfig,
    x: Array,
    timesteps: Array,
    kv_cache: tuple[Array, Array],
    recompute_mask: Array,
    mode: Array | int,
) -> tuple[Array, tuple[Array, Array], Array]:
    """Cached transformer score forward for the compiled sampling loop.

    Args:
        kv_cache: ``(k, v)`` each ``(num_layers, B, T, H, Dh)``.
        recompute_mask: ``(T,)`` bool mask for MODE_MIXED.
        mode: MODE_FULL / MODE_MIXED / MODE_CACHED.  May be a traced scalar —
          `lax.switch` then picks the branch at runtime so pure-cache steps
          skip the K/V projections on-device.

    Returns:
        ``(score, new_kv_cache, crf)`` with crf ``(num_layers, T, d_model)``.
    """
    assert cfg.backbone == "transformer", "KV caching applies to the transformer backbone"
    params = variables["params"]
    constants = variables["constants"]

    out_dtype = x.dtype
    if cfg._cdtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(cfg._cdtype), params)
        constants = jax.tree.map(lambda a: a.astype(cfg._cdtype), constants)
        x = x.astype(cfg._cdtype)
        timesteps = timesteps.astype(cfg._cdtype)
        kv_cache = jax.tree.map(lambda a: a.astype(cfg._cdtype), kv_cache)

    h = x @ params["embedder"]["w"] + params["embedder"]["b"]
    h = apply_positional_encoding(params["pos_encoder"], h)
    h = apply_gaussian_fourier_projection(
        params["time_encoder"], constants["time_encoder"], h, timesteps
    )

    def run(mode_static: int):
        def fn(operands):
            hh, kv, mask = operands
            return _transformer_backbone(
                params, cfg, hh, train=False, dropout_key=None,
                kv_cache=kv, recompute_mask=mask, mode=mode_static,
                # The fused blockdiag kernel only implements the standard
                # full-attention forward; cached/mixed branches stay einsum.
                attention_impl=(
                    cfg.attention_impl if mode_static == MODE_FULL else "einsum"
                ),
            )
        return fn

    if isinstance(mode, int):
        out, kv_new, crf = run(mode)((h, kv_cache, recompute_mask))
    else:
        out, kv_new, crf = jax.lax.switch(
            mode,
            [run(MODE_FULL), run(MODE_MIXED), run(MODE_CACHED)],
            (h, kv_cache, recompute_mask),
        )

    score = (out @ params["unembedder"]["w"] + params["unembedder"]["b"]).astype(
        out_dtype
    )
    return score, kv_new, crf
