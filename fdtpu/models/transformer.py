"""Post-norm transformer encoder layer with per-token KV cache modes.

TPU-native redesign of the reference backbone
(`nn.TransformerEncoderLayer`, reference score_models.py:61-66) and its cached
clone (`CachedTransformerEncoderLayer`, reference cached_transformer.py:28-329).

Semantics match torch defaults exactly: post-norm, ReLU, dropout 0.1,
dim_feedforward 2048, LayerNorm eps 1e-5 (SURVEY.md quirk Q8).

Instead of the reference's Python `set[int]` recompute sets and dict/tensor KV
stores, the layer exposes three *static-shape* forward modes selected by
`lax.switch` inside the compiled sampling loop:

* ``full``    — standard attention; returns fresh K/V for a bulk cache write
                (reference cached_transformer.py:142-191).
* ``mixed``   — fresh K/V merged with cached K/V under a boolean token mask
                (reference's scatter path, cached_transformer.py:259-305).
* ``cached``  — Q projected fresh, K/V taken entirely from cache — the
                pure-cache path (reference cached_transformer.py:236-258),
                which genuinely skips the K/V projections.

The KV cache is a per-layer, per-batch array ``(B, T, H, Dh)`` carried through
`lax.scan` — fixing reference quirk Q3 (the torch cache stores only batch
element 0 and broadcasts, silently wrong for batch>1).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from fdtpu.models.initializers import linear_init, xavier_uniform

Array = jax.Array
Params = dict[str, Any]

MODE_FULL = 0
MODE_MIXED = 1
MODE_CACHED = 2


def init_encoder_layer(
    key: Array, d_model: int, dim_feedforward: int = 2048
) -> Params:
    """Parameters for one encoder layer, torch-default initialized.

    torch MultiheadAttention: in-proj xavier-uniform with zero bias, out-proj
    Linear default weights with zero bias; Linear/LayerNorm defaults elsewhere.
    """
    keys = jax.random.split(key, 4)
    in_proj_w = xavier_uniform(keys[0], d_model, 3 * d_model)
    out_w, _ = linear_init(keys[1], d_model, d_model)
    w1, b1 = linear_init(keys[2], d_model, dim_feedforward)
    w2, b2 = linear_init(keys[3], dim_feedforward, d_model)
    return {
        "attn": {
            "in_proj_w": in_proj_w,
            "in_proj_b": jnp.zeros((3 * d_model,)),
            "out_w": out_w,
            "out_b": jnp.zeros((d_model,)),
        },
        "linear1": {"w": w1, "b": b1},
        "linear2": {"w": w2, "b": b2},
        "ln1": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
        "ln2": {"scale": jnp.ones((d_model,)), "bias": jnp.zeros((d_model,))},
    }


def _layer_norm(x: Array, p: Params, eps: float = 1e-5) -> Array:
    # Statistics in float32 for mixed-precision stability.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (normed.astype(x.dtype)) * p["scale"] + p["bias"]


def _split_heads(x: Array, n_head: int) -> Array:
    """(B, T, D) → (B, T, H, Dh) — a pure reshape; the head axis is never
    transposed into its own major dimension (layout changes on unaligned
    (T, Dh) tiles are the expensive part of small-head attention on TPU)."""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _merge_heads(x: Array) -> Array:
    """(B, T, H, Dh) → (B, T, D)."""
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def _attention(q: Array, k: Array, v: Array) -> Array:
    """Scaled dot-product attention over (B, T, H, Dh) tensors.

    Scores accumulate and softmax runs in float32 (mixed-precision safe);
    the value contraction stays in the compute dtype.  The einsums contract
    directly from the token-major layout — no head transposes.
    """
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def _maybe_dropout(
    x: Array, rate: float, train: bool, key: Optional[Array]
) -> Array:
    if not train or rate <= 0.0 or key is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def project_q(p: Params, x: Array, n_head: int) -> Array:
    d = x.shape[-1]
    q = x @ p["attn"]["in_proj_w"][:, :d] + p["attn"]["in_proj_b"][:d]
    return _split_heads(q, n_head)


def project_kv(p: Params, x: Array, n_head: int) -> tuple[Array, Array]:
    d = x.shape[-1]
    kv = x @ p["attn"]["in_proj_w"][:, d:] + p["attn"]["in_proj_b"][d:]
    k, v = jnp.split(kv, 2, axis=-1)
    return _split_heads(k, n_head), _split_heads(v, n_head)


def encoder_layer_topk(
    p: Params,
    x_rows: Array,
    kv_cache: tuple[Array, Array],
    idx: Array,
    n_head: int,
    *,
    ln_eps: float = 1e-5,
) -> tuple[Array, tuple[Array, Array]]:
    """Token-budget layer: recompute attention + FFN for the ``idx`` rows only.

    This is the static-shape realization of the paper's per-token E²-CRF
    savings (reference cached_transformer.py:236-317 claims −50% KV-proj,
    −45% MLP, −30% attention): a compile-time budget of ``k = len(idx)``
    tokens is gathered into a dense ``(B, k, D)`` block, projected and run
    through the FFN, and the fresh K/V rows are scattered into the cached
    ``(B, T, H, Dh)`` stores.  Non-selected tokens are not touched at all —
    their contribution rides the cached K/V (and the cached per-token ε̂ at
    the output), so the skipped FLOPs are real, unlike a masked
    compute-everything-select-some formulation.

    Args:
        x_rows: ``(B, k, D)`` hidden states of the selected tokens.
        kv_cache: ``(k, v)`` each ``(B, T, H, Dh)`` — full-width cache.
        idx: ``(k,)`` int32 token indices (shared across the batch).

    Returns:
        ``(y_rows, (k_full, v_full))`` — updated rows and scattered caches.
    """
    q = project_q(p, x_rows, n_head)  # (B, k, H, Dh)
    k_new, v_new = project_kv(p, x_rows, n_head)
    k_full = kv_cache[0].at[:, idx].set(k_new)
    v_full = kv_cache[1].at[:, idx].set(v_new)

    attn_out = _merge_heads(_attention(q, k_full, v_full))  # (B, k, D)
    attn_out = attn_out @ p["attn"]["out_w"] + p["attn"]["out_b"]
    x_rows = _layer_norm(x_rows + attn_out, p["ln1"], ln_eps)

    ff = jax.nn.relu(x_rows @ p["linear1"]["w"] + p["linear1"]["b"])
    ff = ff @ p["linear2"]["w"] + p["linear2"]["b"]
    x_rows = _layer_norm(x_rows + ff, p["ln2"], ln_eps)
    return x_rows, (k_full, v_full)


def encoder_layer_apply(
    p: Params,
    x: Array,
    n_head: int,
    *,
    dropout: float = 0.1,
    ln_eps: float = 1e-5,
    train: bool = False,
    dropout_key: Optional[Array] = None,
    kv_cache: Optional[tuple[Array, Array]] = None,
    recompute_mask: Optional[Array] = None,
    mode: int = MODE_FULL,
    attention_impl: str = "einsum",
) -> tuple[Array, tuple[Array, Array]]:
    """One post-norm encoder layer.

    Args:
        p: layer params from :func:`init_encoder_layer`.
        x: ``(B, T, D)`` hidden states.
        kv_cache: optional ``(k, v)`` each ``(B, T, H, Dh)`` from a previous
          diffusion step.
        recompute_mask: ``(T,)`` bool — tokens whose K/V are refreshed in
          ``mixed`` mode.
        mode: MODE_FULL / MODE_MIXED / MODE_CACHED (static per branch; the
          sampling loop selects between compiled branches with `lax.switch`).

    Returns:
        ``(y, (k, v))`` where (k, v) is the K/V state to carry forward.
    """
    if dropout_key is not None:
        dk = jax.random.split(dropout_key, 3)
    else:
        dk = (None, None, None)

    if mode == MODE_CACHED:
        assert kv_cache is not None
        q = project_q(p, x, n_head)
        k, v = kv_cache
    elif mode == MODE_MIXED:
        assert kv_cache is not None and recompute_mask is not None
        q = project_q(p, x, n_head)
        k_fresh, v_fresh = project_kv(p, x, n_head)
        m = recompute_mask[None, :, None, None]  # (1, T, 1, 1)
        k = jnp.where(m, k_fresh, kv_cache[0])
        v = jnp.where(m, v_fresh, kv_cache[1])
    else:  # MODE_FULL
        if attention_impl in ("blockdiag", "blockdiag_noshift"):
            # Block-diagonal fused kernel: project straight into its layouts
            # (head-major K^T / V) so the relayout fuses into the matmuls.
            from fdtpu.kernels.blockdiag_attention import blockdiag_mha_trainable

            d = x.shape[-1]
            dh = d // n_head
            w = p["attn"]["in_proj_w"]
            bias = p["attn"]["in_proj_b"]
            q2 = x @ w[:, :d] + bias[:d]  # (B, T, D)
            wk = w[:, d:2 * d].reshape(d, n_head, dh)
            wv = w[:, 2 * d:].reshape(d, n_head, dh)
            k2 = jnp.einsum("btd,dhe->bhet", x, wk) + bias[d:2 * d].reshape(
                n_head, dh
            )[None, :, :, None]
            v2 = jnp.einsum("btd,dhe->bhte", x, wv) + bias[2 * d:].reshape(
                n_head, dh
            )[None, :, None, :]
            # "blockdiag_noshift" drops the softmax max-subtraction VPU
            # pass — forward-only experiment, safe iff logits ≪ 88;
            # measured non-finite on full sampling chains and REJECTED
            # (docs/benchmarks/noshift_exp.json).
            attn_out = blockdiag_mha_trainable(
                q2, k2, v2, 256, attention_impl != "blockdiag_noshift"
            )
            attn_out = attn_out @ p["attn"]["out_w"] + p["attn"]["out_b"]
            x = _layer_norm(
                x + _maybe_dropout(attn_out, dropout, train, dk[0]), p["ln1"], ln_eps
            )
            ff = jax.nn.relu(x @ p["linear1"]["w"] + p["linear1"]["b"])
            ff = _maybe_dropout(ff, dropout, train, dk[1])
            ff = ff @ p["linear2"]["w"] + p["linear2"]["b"]
            x = _layer_norm(
                x + _maybe_dropout(ff, dropout, train, dk[2]), p["ln2"], ln_eps
            )
            # Standard-layout K/V for the carried cache type; dead-code
            # eliminated when the caller discards them (uncached forward).
            k_std = k2.transpose(0, 3, 1, 2)
            v_std = v2.transpose(0, 2, 1, 3)
            return x, (k_std, v_std)
        q = project_q(p, x, n_head)
        k, v = project_kv(p, x, n_head)

    attn_out = _merge_heads(_attention(q, k, v))
    attn_out = attn_out @ p["attn"]["out_w"] + p["attn"]["out_b"]
    x = _layer_norm(x + _maybe_dropout(attn_out, dropout, train, dk[0]), p["ln1"], ln_eps)

    ff = jax.nn.relu(x @ p["linear1"]["w"] + p["linear1"]["b"])
    ff = _maybe_dropout(ff, dropout, train, dk[1])
    ff = ff @ p["linear2"]["w"] + p["linear2"]["b"]
    x = _layer_norm(x + _maybe_dropout(ff, dropout, train, dk[2]), p["ln2"], ln_eps)

    return x, (k, v)
