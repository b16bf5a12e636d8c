"""Tests for the quality-constrained τ₀ calibration API
(fdtpu/sampling/calibrate.py) — the user-facing counterpart of the
headline protocol in docs/benchmarks/tau_headline.json."""

import jax
import numpy as np

from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import TauCalibration, calibrate_tau_0

MAX_LEN, CHANNELS = 20, 2
TINY = dict(d_model=8, num_layers=2, n_head=4, dim_feedforward=32)


def make_model(seed=0):
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    variables = init_score_model(jax.random.PRNGKey(seed), cfg)
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    return ScoreModel(
        config=cfg, variables=variables, scheduler=sde, num_training_steps=10
    )


def test_calibrate_returns_auditable_ladder():
    model = make_model()
    result = calibrate_tau_0(
        model,
        num_samples=16,
        num_diffusion_steps=10,
        sample_batch_size=16,
        key=jax.random.PRNGKey(1),
        ladder=(1.2, 0.6),
        num_directions=32,
    )
    assert isinstance(result, TauCalibration)
    assert result.sw_noise_floor > 0
    assert 1 <= len(result.arms) <= 2
    for arm in result.arms:
        assert arm.tau_0 in (1.2, 0.6)
        assert np.isfinite(arm.sw_vs_uncached)
        assert 0.0 <= arm.steps_skipped_ratio <= 1.0
        assert arm.accepted == (arm.within_floor and arm.guard_silent)
    if result.tau_0 is not None:
        # First accepted arm is the chosen one and the last evaluated.
        assert result.accepted is result.arms[-1]
        assert result.cache_kwargs["tau_0"] == result.tau_0
        assert result.cache_kwargs["level"] == "score"
    else:
        assert all(not a.accepted for a in result.arms)
        assert "tau_0" not in result.cache_kwargs


def test_calibrate_rejects_everything_under_impossible_floor():
    """With guard thresholds forced to 0 every arm must be rejected and
    tau_0 must come back None (uncached recommendation)."""
    model = make_model()
    result = calibrate_tau_0(
        model,
        num_samples=8,
        num_diffusion_steps=10,
        sample_batch_size=8,
        key=jax.random.PRNGKey(2),
        ladder=(1.0,),
        num_directions=16,
        guard_abs_tol=0.0,
        guard_max_tol=0.0,
    )
    assert result.tau_0 is None
    assert result.accepted is None
    assert len(result.arms) == 1 and not result.arms[0].accepted


def test_calibrate_kwargs_seed_cache_config():
    """Non-τ₀ cache kwargs flow through to the recommendation."""
    model = make_model()
    result = calibrate_tau_0(
        model,
        num_samples=8,
        num_diffusion_steps=10,
        sample_batch_size=8,
        key=jax.random.PRNGKey(3),
        ladder=(0.8,),
        num_directions=16,
        cache_kwargs={"R": 50, "eps_order": 0},
    )
    assert result.cache_kwargs["R"] == 50
    assert result.cache_kwargs["eps_order"] == 0
