"""Sampler tests (mirrors reference tests/test_sampling.py:14-40 and adds
cache-path coverage the reference lacks — SURVEY.md §4 gaps)."""

import jax
import numpy as np
import pytest

from fdtpu.diffusion import VEScheduler, VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler

MAX_LEN, CHANNELS = 20, 3
TINY = dict(d_model=8, num_layers=2, n_head=4, dim_feedforward=32)


def make_model(scheduler_cls=VPScheduler, seed=0):
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    variables = init_score_model(jax.random.PRNGKey(seed), cfg)
    sde = scheduler_cls(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    return ScoreModel(config=cfg, variables=variables, scheduler=sde, num_training_steps=10)


@pytest.mark.parametrize("scheduler_cls", [VPScheduler, VEScheduler])
def test_sample_shape_uncached(scheduler_cls):
    model = make_model(scheduler_cls)
    sampler = DiffusionSampler(model, sample_batch_size=16)
    samples = sampler.sample(num_samples=48, num_diffusion_steps=10, key=jax.random.PRNGKey(1))
    assert samples.shape == (48, MAX_LEN, CHANNELS)
    assert np.isfinite(samples).all()


def test_sample_remainder_semantics():
    """Reference drops the remainder: num_batches = max(1, N // B) (quirk Q6)."""
    model = make_model()
    sampler = DiffusionSampler(model, sample_batch_size=16)
    samples = sampler.sample(num_samples=40, num_diffusion_steps=4, key=jax.random.PRNGKey(1))
    assert samples.shape[0] == 32  # 40 // 16 = 2 batches of 16
    small = sampler.sample(num_samples=5, num_diffusion_steps=4, key=jax.random.PRNGKey(1))
    assert small.shape[0] == 5  # single batch of the full request


def test_sample_deterministic_given_key():
    model = make_model()
    sampler = DiffusionSampler(model, sample_batch_size=8)
    s1 = sampler.sample(8, 5, key=jax.random.PRNGKey(7))
    s2 = sampler.sample(8, 5, key=jax.random.PRNGKey(7))
    np.testing.assert_allclose(s1, s2)
    s3 = sampler.sample(8, 5, key=jax.random.PRNGKey(8))
    assert np.abs(s1 - s3).max() > 1e-4


@pytest.mark.parametrize("policy", ["macro", "event"])
def test_cached_kv_sampling_runs_and_counts(policy):
    model = make_model()
    sampler = DiffusionSampler(
        model,
        sample_batch_size=4,
        use_cache=True,
        cache_kwargs={"policy": policy, "level": "kv", "K": 2, "R": 5},
    )
    samples = sampler.sample(4, 12, key=jax.random.PRNGKey(2))
    assert samples.shape == (4, MAX_LEN, CHANNELS)
    assert np.isfinite(samples).all()
    stats = sampler.get_cache_stats()
    assert stats["current_step"] == 12
    assert stats["full_steps"] >= 1
    assert stats["recompute_count"] > 0
    if policy == "macro":
        # step 0 full, steps 1..11 pure cache (interval auto-scales to 500).
        assert stats["cached_steps"] == 11
        assert stats["full_steps"] == 1


def test_cached_score_level_skips_steps():
    model = make_model()
    sampler = DiffusionSampler(
        model,
        sample_batch_size=4,
        use_cache=True,
        cache_kwargs={"level": "score", "R": 4, "tau_0": 1e9},
    )
    samples = sampler.sample(4, 12, key=jax.random.PRNGKey(3))
    assert np.isfinite(samples).all()
    stats = sampler.get_cache_stats()
    # With a huge tau_0 budget: step 0 full, step 1 calibration, then refresh
    # only at the R interval → steps 0, 1, 4, 8 full; the other 8 skipped.
    assert stats["full_steps"] == 4
    assert stats["cached_steps"] == 8
    assert stats["steps_skipped_ratio"] == pytest.approx(8 / 12)


def test_cached_score_level_error_feedback_triggers():
    """tau_0 = 0 → every step recomputes (the error budget is instantly spent)."""
    model = make_model()
    sampler = DiffusionSampler(
        model,
        sample_batch_size=4,
        use_cache=True,
        cache_kwargs={"level": "score", "R": 1000, "tau_0": 0.0},
    )
    sampler.sample(4, 8, key=jax.random.PRNGKey(4))
    stats = sampler.get_cache_stats()
    # step 0 full; step 1 skips (err_acc==0 after refresh, drift accumulates
    # only after a skip); from step 2 on the budget (0.0) is always exceeded.
    assert stats["full_steps"] >= 6


def test_cached_matches_uncached_when_always_recomputing():
    """KV cache with R=1 (refresh every step) must equal the uncached sampler
    exactly — the numerical cached-vs-uncached equivalence test the reference
    lacks (SURVEY.md §4)."""
    model = make_model()
    uncached = DiffusionSampler(model, sample_batch_size=4)
    cached = DiffusionSampler(
        model,
        sample_batch_size=4,
        use_cache=True,
        cache_kwargs={"policy": "event", "level": "kv", "K": MAX_LEN, "R": 1},
    )
    s_un = uncached.sample(4, 6, key=jax.random.PRNGKey(5))
    s_ca = cached.sample(4, 6, key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(s_un, s_ca, atol=1e-5)


def test_cache_error_budget_controls_quality():
    """Score-level caching: a tighter error budget (smaller tau_0) must track
    the uncached trajectory more closely.  (Absolute quality at matched
    Wasserstein is validated on trained models in the benchmark CLI — an
    untrained net's scores drift arbitrarily fast.)"""
    model = make_model()
    uncached = DiffusionSampler(model, sample_batch_size=32)
    s_un = uncached.sample(32, 50, key=jax.random.PRNGKey(6))

    def rel_dev(tau):
        cached = DiffusionSampler(
            model,
            sample_batch_size=32,
            use_cache=True,
            cache_kwargs={"level": "score", "R": 25, "tau_0": tau},
        )
        s_ca = cached.sample(32, 50, key=jax.random.PRNGKey(6))
        return np.linalg.norm(s_un - s_ca) / np.linalg.norm(s_un)

    tight, loose = rel_dev(0.01), rel_dev(1e9)
    assert tight < loose, (tight, loose)
    assert tight < 0.2, tight


def test_fresca_sampling_runs():
    model = make_model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_fresca=True,
        fresca_high_scale=1.5, fresca_cutoff_strategy="energy",
    )
    samples = sampler.sample(4, 6, key=jax.random.PRNGKey(9))
    assert np.isfinite(samples).all()
    base = DiffusionSampler(model, sample_batch_size=4).sample(4, 6, key=jax.random.PRNGKey(9))
    assert np.abs(samples - base).max() > 1e-6  # FreSca actually changed the scores


def test_cross_batch_cache_recomputes_at_new_trajectory():
    """Cache persists across batches (reference quirk Q5) but each new
    trajectory must start with a full recompute, never the previous
    trajectory's cached prediction."""
    model = make_model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_cache=True,
        cache_kwargs={"level": "score", "R": 1000, "tau_0": 1e9},
    )
    sampler.sample(12, 6, key=jax.random.PRNGKey(12))  # 3 batches of 4
    stats = sampler.get_cache_stats()
    # Per batch: step-0-equivalent full + calibration full = 2; rest skipped.
    assert stats["full_steps"] == 6, stats
    assert stats["cached_steps"] == 12, stats


def test_freqca_enabled_sampling_runs():
    """KV-level caching with FreqCa decomposition history in the scan carry."""
    model = make_model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_cache=True,
        cache_kwargs={
            "level": "kv", "policy": "event", "K": 2, "R": 4,
            "use_freqca": True, "freq_decomp_interval": 2, "max_history": 4,
        },
    )
    samples = sampler.sample(4, 10, key=jax.random.PRNGKey(21))
    assert np.isfinite(samples).all()
    state = sampler.last_cache_state
    assert int(state.hist_len) >= 2  # decomposition history accumulated
    assert state.crf_high_hist.shape[0] == 4


def test_random_probe_ratio_forces_mixed_steps():
    """quirk Q4: the documented-but-missing random probe knob works here."""
    model = make_model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_cache=True,
        cache_kwargs={
            "level": "kv", "policy": "event", "K": 0, "R": 1000,
            "tau_0": 1e9, "tau_warn": 1e9, "random_probe_ratio": 0.5,
        },
    )
    sampler.sample(4, 10, key=jax.random.PRNGKey(22))
    stats = sampler.get_cache_stats()
    assert stats["mixed_steps"] >= 5, stats
