"""Token-level E²-CRF (static top-k budget) tests.

The token level is the TPU-fast realization of the reference's per-token
recompute mechanism (reference cached_transformer.py:236-317): a
compile-time budget of tokens is gathered, recomputed end-to-end, and
scattered back into the cached K/V and per-token ε̂ rows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.cache.e2crf import E2CRFConfig, init_cache_state
from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import (
    ScoreModel,
    score_apply,
    score_apply_cached,
    score_apply_topk,
)
from fdtpu.sampling import DiffusionSampler

CFG = ScoreModelConfig(
    n_channels=3, max_len=20, d_model=8, num_layers=2, n_head=4,
    dim_feedforward=16,
)


def _model():
    variables = init_score_model(jax.random.PRNGKey(0), CFG)
    sched = VPScheduler(fourier_noise_scaling=False).with_noise_scaling(CFG.max_len)
    return ScoreModel(config=CFG, variables=variables, scheduler=sched)


def test_topk_forward_matches_full_when_budget_is_all_tokens():
    """With idx = all tokens and a fresh-KV cache, the top-k forward must
    reproduce the uncached forward exactly (same math, gathered layout)."""
    model = _model()
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, CFG.max_len, CFG.n_channels))
    t = jnp.full((4,), 0.5)

    full = score_apply(model.variables, CFG, x, t)
    # Populate a KV cache via a full cached forward.
    _, kv, _ = score_apply_cached(
        model.variables, CFG, x, t,
        (
            jnp.zeros((CFG.num_layers, 4, CFG.max_len, CFG.n_head, CFG.head_dim)),
            jnp.zeros((CFG.num_layers, 4, CFG.max_len, CFG.n_head, CFG.head_dim)),
        ),
        jnp.ones((CFG.max_len,), bool), 0,
    )
    idx = jnp.arange(CFG.max_len)
    rows, kv_new = score_apply_topk(model.variables, CFG, x, t, kv, idx)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(full), atol=1e-5)
    # All K/V rows refreshed → caches must match the full forward's.
    np.testing.assert_allclose(np.asarray(kv_new[0]), np.asarray(kv[0]), atol=1e-5)


def test_topk_forward_partial_budget_shapes_and_scatter():
    """A partial budget recomputes exactly the selected K/V rows."""
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, CFG.max_len, CFG.n_channels))
    t = jnp.full((2,), 0.3)
    kv = (
        jnp.ones((CFG.num_layers, 2, CFG.max_len, CFG.n_head, CFG.head_dim)),
        jnp.ones((CFG.num_layers, 2, CFG.max_len, CFG.n_head, CFG.head_dim)),
    )
    idx = jnp.asarray([0, 5, 7])
    rows, kv_new = score_apply_topk(model.variables, CFG, x, t, kv, idx)
    assert rows.shape == (2, 3, CFG.n_channels)
    k_new = np.asarray(kv_new[0])
    untouched = np.delete(np.arange(CFG.max_len), np.asarray(idx))
    np.testing.assert_array_equal(k_new[:, :, untouched], 1.0)
    assert not np.allclose(k_new[:, :, np.asarray(idx)], 1.0)


def test_token_level_full_budget_matches_uncached_sampler():
    """token_budget = max_len with skipping disabled (τ₀=0) recomputes every
    token every step → the trajectory must match the uncached sampler."""
    model = _model()
    uncached = DiffusionSampler(model, sample_batch_size=8)
    cached = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True,
        cache_kwargs={
            "level": "token", "token_budget": CFG.max_len, "tau_0": 0.0,
            "R": 1000,
        },
    )
    key = jax.random.PRNGKey(3)
    a = uncached.sample(8, 20, key=key)
    b = cached.sample(8, 20, key=key)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_token_level_stats_and_modes():
    """Counters: every step is full, topk, or skip; R forces refreshes."""
    model = _model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_cache=True,
        cache_kwargs={
            "level": "token", "token_budget": 5, "tau_0": 0.05, "R": 10,
        },
    )
    sampler.sample(4, 40, key=jax.random.PRNGKey(4))
    stats = sampler.get_cache_stats()
    total = stats["full_steps"] + stats["mixed_steps"] + stats["cached_steps"]
    assert total == 40
    # R=10 over 40 steps → at least 4 full refreshes (plus calibration).
    assert stats["full_steps"] >= 4
    assert stats["current_step"] == 40


def test_token_level_tau0_zero_never_skips():
    """τ₀ = 0 disables the skip tier: the pure token-level mechanism."""
    model = _model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_cache=True,
        cache_kwargs={
            "level": "token", "token_budget": 4, "tau_0": 0.0, "R": 20,
        },
    )
    sampler.sample(4, 30, key=jax.random.PRNGKey(5))
    stats = sampler.get_cache_stats()
    assert stats["cached_steps"] == 0
    assert stats["mixed_steps"] > 0


def test_token_level_quality_close_to_uncached_at_small_tau():
    """With a small τ₀ and modest budget the sampled distribution stays close
    to the uncached run (same key ⇒ same noise path; deviation comes only
    from the per-token extrapolation)."""
    model = _model()
    uncached = DiffusionSampler(model, sample_batch_size=16)
    cached = DiffusionSampler(
        model, sample_batch_size=16, use_cache=True,
        cache_kwargs={
            "level": "token", "token_budget": 10, "tau_0": 0.02, "R": 5,
        },
    )
    key = jax.random.PRNGKey(6)
    a = uncached.sample(16, 50, key=key)
    b = cached.sample(16, 50, key=key)
    # Untrained network ⇒ loose tolerance; the trajectories must stay in the
    # same regime (no blow-ups from stale-row rescaling).
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.5


def test_token_budget_validation():
    model = _model()
    with pytest.raises(ValueError):
        DiffusionSampler(
            model, sample_batch_size=4, use_cache=True,
            cache_kwargs={"level": "token", "token_budget": 0},
        )
    with pytest.raises(ValueError):
        DiffusionSampler(
            model, sample_batch_size=4, use_cache=True,
            cache_kwargs={"level": "token", "token_budget": CFG.max_len + 1},
        )


def test_token_level_cache_state_allocation():
    cfg = E2CRFConfig(level="token", token_budget=5)
    state = init_cache_state(
        cfg, num_layers=2, batch=4, n_head=4, max_len=20, head_dim=2,
        d_model=8, n_channels=3,
    )
    assert state.k.shape == (2, 4, 20, 4, 2)
    assert state.eps_hat.shape == (4, 20, 3)
    assert state.eps_prev.shape == (4, 20, 3)
    assert state.eps_prev2.shape == (0,)  # score-level only
    assert state.gap_tok.shape == (20,)
    assert state.last_tok.shape == (20,)
    assert state.crf_prev.shape == (0,)  # kv-level only


def test_topk_steps_feed_guard_telemetry():
    """TOPK refreshes record guard measurements (the stale-token audit):
    without them, token-level cumulative collapse is structurally
    invisible — the policy only measures tokens it chose to recompute
    (guard_demo_v2.json).  With τ₀=0 every non-full step is TOPK, so the
    measurement count must exceed what full refreshes alone provide."""
    model = _model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_cache=True,
        cache_kwargs={
            "level": "token", "token_budget": 4, "tau_0": 0.0, "R": 20,
            "random_probe_ratio": 0.1, "guard": "off",
        },
    )
    sampler.sample(4, 30, key=jax.random.PRNGKey(6))
    stats = sampler.get_cache_stats()
    assert stats["mixed_steps"] > 0
    # full-refresh measurements alone would be ≤ full_steps; the TOPK
    # audit contributes the rest.
    assert stats["guard_measurements"] > stats["full_steps"]
