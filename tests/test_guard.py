"""Error-budget guard rail tests (VERDICT round-2 ask #3).

The score/token cache levels skip network evaluations on the assumption
that the predicted (accumulated-drift) budget tracks the realized ε̂
extrapolation error.  docs/benchmarks/token_level.md documents the silent
failure mode: a loose budget (τ₀=3 hybrid arm → SW 88.8; pure-periodic
R=50 → SW 492) collapses the sampled distribution with no runtime signal.
These tests pin the guard that now exists in code: telemetry in
cache_stats, warn/strict escalation, and closed-loop τ₀ auto-calibration.
"""

import warnings

import jax
import pytest

from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler

MAX_LEN, CHANNELS = 20, 3
TINY = dict(d_model=8, num_layers=2, n_head=4, dim_feedforward=32)


def make_model(seed=0):
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    variables = init_score_model(jax.random.PRNGKey(seed), cfg)
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    return ScoreModel(
        config=cfg, variables=variables, scheduler=sde, num_training_steps=10
    )


def _sample(model, cache_kwargs, steps=60, batch=8, key=0):
    sampler = DiffusionSampler(
        model, sample_batch_size=batch, use_cache=True,
        cache_kwargs=cache_kwargs,
    )
    sampler.sample(batch, steps, key=jax.random.PRNGKey(key))
    return sampler


def test_guard_telemetry_populated_score_level():
    """Every full refresh that closes a skip span records realized vs
    predicted error in cache_stats."""
    model = make_model()
    sampler = _sample(
        model, {"level": "score", "R": 10, "tau_0": 1e9, "guard": "off"}
    )
    stats = sampler.get_cache_stats()
    # R=10 over 60 steps → several span-closing refreshes measured.
    assert stats["guard_measurements"] >= 3
    assert stats["realized_err_mean"] > 0
    assert stats["realized_err_max"] >= stats["realized_err_mean"]
    assert stats["budget_overrun_ratio"] > 0
    assert stats["overrun_mark"] > 0


def test_guard_strict_raises_on_collapse_regime():
    """An untrained net under a loose budget is exactly the collapse
    regime: extrapolation error explodes past the predicted budget and
    guard='strict' must raise (the τ₀=3 / R=50 arms of token_level.md made
    runtime-detectable)."""
    model = make_model()
    with pytest.raises(RuntimeError, match="error-budget guard"):
        _sample(
            model,
            {"level": "score", "R": 50, "tau_0": 1e9, "guard": "strict"},
            steps=120,
        )


def test_guard_warn_default_emits_warning():
    model = make_model()
    with pytest.warns(UserWarning, match="error-budget guard"):
        _sample(model, {"level": "score", "R": 50, "tau_0": 1e9}, steps=120)


def test_guard_token_level_detects_collapse():
    """No explicit random_probe_ratio: this runs at the token-level DEFAULT
    (0.02 auto probe), so it also pins that an out-of-the-box token config
    catches collapse without the caller opting into auditing (VERDICT r4
    ask #5)."""
    model = make_model()
    with pytest.raises(RuntimeError, match="error-budget guard"):
        _sample(
            model,
            {
                "level": "token", "token_budget": 4, "R": 50, "tau_0": 1e9,
                "guard": "strict",
            },
            steps=120,
        )


def test_token_probe_ratio_auto_default():
    """random_probe_ratio defaults to -1 = auto: 0.02 at the token level
    (stale-row auditing, guard_demo_v2.json), 0.0 everywhere else; an
    explicit value wins at every level."""
    from fdtpu.cache.e2crf import E2CRFConfig

    tok = E2CRFConfig(level="token", token_budget=4)
    assert tok.resolved_random_probe_ratio == 0.02
    assert float(tok.policy_params().random_probe_ratio) == pytest.approx(0.02)
    assert E2CRFConfig(level="score").resolved_random_probe_ratio == 0.0
    assert E2CRFConfig(level="kv").resolved_random_probe_ratio == 0.0
    explicit = E2CRFConfig(level="token", token_budget=4, random_probe_ratio=0.1)
    assert explicit.resolved_random_probe_ratio == 0.1


def test_token_explicit_zero_probe_warns_at_construction():
    """Explicitly disabling probing at the token level (with the guard on)
    warns at sampler construction: unprobed rows make cumulative collapse
    invisible to the TOPK audit."""
    model = make_model()
    with pytest.warns(UserWarning, match="unaudited"):
        DiffusionSampler(
            model, sample_batch_size=4, use_cache=True,
            cache_kwargs={
                "level": "token", "token_budget": 4,
                "random_probe_ratio": 0.0,
            },
        )
    # guard="off" is the documented opt-out — no warning.
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        DiffusionSampler(
            model, sample_batch_size=4, use_cache=True,
            cache_kwargs={
                "level": "token", "token_budget": 4,
                "random_probe_ratio": 0.0, "guard": "off",
            },
        )


def test_guard_quiet_on_tight_budget():
    """A tight budget (short spans, realized ≈ predicted) must not trip
    the guard — the detector separates safe from collapsing configs."""
    model = make_model()
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        # guard_max_tol is relaxed here: an UNTRAINED net's worst spans
        # realize large errors even under a tight budget (its trajectories
        # are meaningless); the max-criterion's quietness on safe operating
        # points is validated on a trained flagship in
        # docs/benchmarks/guard_demo.json.
        sampler = _sample(
            model,
            {"level": "score", "R": 8, "tau_0": 0.05, "guard": "strict",
             "guard_max_tol": 100.0},
            steps=150,
        )
    stats = sampler.get_cache_stats()
    assert stats["full_steps"] >= 10  # actually refreshing often
    assert stats["cached_steps"] >= 10  # ...while still skipping


def test_auto_calibrate_tightens_budget():
    """auto_calibrate=True divides the effective τ₀ by the realized
    overrun EMA: under a mis-calibrated (loose) budget it must refresh
    more often than the open-loop config."""
    model = make_model()
    loose = _sample(
        model, {"level": "score", "R": 1000, "tau_0": 5.0, "guard": "off"},
        steps=150,
    )
    calibrated = _sample(
        model,
        {
            "level": "score", "R": 1000, "tau_0": 5.0, "guard": "off",
            "auto_calibrate": True,
        },
        steps=150,
    )
    s_loose = loose.get_cache_stats()
    s_cal = calibrated.get_cache_stats()
    assert s_cal["full_steps"] > s_loose["full_steps"]
    # And the closed loop realizes less error per span than the open loop.
    assert s_cal["realized_err_mean"] <= s_loose["realized_err_mean"]


def test_kv_event_degenerate_tau_warns():
    """Reference-parity defaults (tau_0=0.1, unnormalized CRF drift) are a
    known-degenerate KV operating point — constructing that sampler warns
    (VERDICT round-2 weak #6)."""
    model = make_model()
    with pytest.warns(UserWarning, match="unnormalized"):
        DiffusionSampler(
            model, sample_batch_size=4, use_cache=True,
            cache_kwargs={"level": "kv", "policy": "event", "tau_0": 0.1},
        )


def test_guard_relative_error_floors_denominator():
    """End-of-trajectory ε̂-norm shrinkage must not inflate the guard
    statistic: with trajectory scale 154 and an instantaneous norm of 0.6
    (the diagnosed BENCH_r03 spike), a 12.5 absolute error reads as ~0.8
    relative to the floored denominator instead of ~20."""
    import jax.numpy as jnp

    from fdtpu.cache.e2crf import GUARD_NORM_FLOOR_FRAC, guard_relative_error

    ref = jnp.asarray(154.0)
    # Healthy denominator: floor inactive, plain ratio.
    healthy = float(
        guard_relative_error(jnp.asarray(30.0), jnp.asarray(150.0), ref)
    )
    assert abs(healthy - 30.0 / 150.0) < 1e-6
    # Collapsed denominator: floored at 10% of the trajectory scale.
    rel = float(guard_relative_error(jnp.asarray(12.5), jnp.asarray(0.61), ref))
    assert abs(rel - 12.5 / (GUARD_NORM_FLOOR_FRAC * 154.0)) < 1e-6
    assert rel < 1.0  # the 20.5 spike regime is gone
