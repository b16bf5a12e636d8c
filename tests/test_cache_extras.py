"""FreqCa prediction, event-intensity, stats, and callback coverage —
subsystems the reference ships untested (SURVEY.md §4 gaps)."""

import jax
import jax.numpy as jnp
import numpy as np

from fdtpu.cache.e2crf import (
    E2CRFConfig,
    cache_stats,
    compute_event_intensity,
    init_cache_state,
    predict_crf_freqca,
    update_after_forward,
)
from fdtpu.models.transformer import MODE_FULL


def make_state(cfg, **kw):
    return init_cache_state(
        cfg, num_layers=2, batch=3, n_head=2, max_len=8, head_dim=4,
        d_model=8, n_channels=1, **kw,
    )


def test_freqca_history_and_prediction():
    cfg = E2CRFConfig(level="kv", use_freqca=True, max_history=4, freq_decomp_interval=1)
    state = make_state(cfg)
    mask = jnp.ones((8,), bool)
    kv = (jnp.zeros((2, 3, 8, 2, 4)), jnp.zeros((2, 3, 8, 2, 4)))

    # Feed a CRF sequence that evolves linearly in t: prediction at an
    # intermediate timestep should land between history values.
    for i, t in enumerate([1.0, 0.9, 0.8, 0.7]):
        crf = jnp.full((2, 8, 8), t)
        state = update_after_forward(cfg, state, jnp.asarray(MODE_FULL), mask, kv, crf, jnp.asarray(t))
        state = state.replace(step=state.step + 1)

    assert int(state.hist_len) == 4
    pred = predict_crf_freqca(cfg, state, jnp.asarray(0.75))
    # CRF(t) = t everywhere → prediction ≈ 0.75 (low-freq carries the value;
    # high-freq history is ~0).
    np.testing.assert_allclose(np.asarray(pred), 0.75, atol=0.08)


def test_freqca_insufficient_history_falls_back():
    cfg = E2CRFConfig(level="kv", use_freqca=True, max_history=4, freq_decomp_interval=1)
    state = make_state(cfg)
    crf = jnp.full((2, 8, 8), 0.5)
    state = state.replace(crf_prev=crf, hist_len=jnp.asarray(1))
    pred = predict_crf_freqca(cfg, state, jnp.asarray(0.4))
    np.testing.assert_allclose(np.asarray(pred), 0.5, atol=1e-5)


def test_event_intensity_normalized_by_tau():
    cfg = E2CRFConfig(level="kv", tau_0=0.5)
    state = make_state(cfg)
    crf_prev = jnp.zeros((2, 8, 8))
    state = state.replace(crf_prev=crf_prev)
    crf_small = jnp.full((2, 8, 8), 0.01)
    crf_large = jnp.full((2, 8, 8), 10.0)
    small = float(compute_event_intensity(cfg, state, crf_small))
    large = float(compute_event_intensity(cfg, state, crf_large))
    assert 0 < small < large
    assert large == 1.0  # capped


def test_cache_stats_keys():
    cfg = E2CRFConfig(level="kv")
    state = make_state(cfg)
    state = state.replace(
        recompute_count=jnp.asarray(10),
        cache_hit_count=jnp.asarray(90),
        full_steps=jnp.asarray(1),
        cached_steps=jnp.asarray(9),
        step=jnp.asarray(10),
    )
    stats = cache_stats(state)
    assert stats["cache_hit_ratio"] == 0.9
    assert stats["current_step"] == 10
    assert stats["steps_skipped_ratio"] == 0.9


def test_diffusion_method_comparison_callback():
    from fdtpu.diffusion import VPScheduler
    from fdtpu.models import ScoreModelConfig, init_score_model
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.train.callbacks import DiffusionMethodComparisonCallback

    cfg = ScoreModelConfig(
        n_channels=1, max_len=12, d_model=8, num_layers=1, n_head=2,
        dim_feedforward=16,
    )
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=VPScheduler().with_noise_scaling(12),
        num_training_steps=4,
    )
    cb = DiffusionMethodComparisonCallback(
        model_template=model,
        methods=[
            {"name": "baseline", "num_diffusion_steps": 4, "use_cache": False},
            {"name": "cached", "num_diffusion_steps": 4, "use_cache": True,
             "cache_kwargs": {"level": "score", "R": 2}},
        ],
        num_samples=2,
        sample_batch_size=2,
    )
    results = cb.run(model.variables)
    assert set(results) == {"baseline", "cached"}
    assert "speedup_vs_baseline" in results["cached"]
    assert results["cached"]["cache_stats"]["current_step"] == 4


def _tiny_model():
    from fdtpu.diffusion import VPScheduler
    from fdtpu.models import ScoreModelConfig, init_score_model
    from fdtpu.models.score_models import ScoreModel

    cfg = ScoreModelConfig(
        n_channels=1, max_len=16, d_model=8, num_layers=2, n_head=4,
        dim_feedforward=16,
    )
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(16)
    return ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
    )


def test_freqca_eps_predictor_live_arm():
    """FreqCa as a live score-level ε̂ predictor (VERDICT r3 ask #4): skips
    steps, stays finite, and populates the refresh history ring."""
    from fdtpu.sampling import DiffusionSampler

    model = _tiny_model()
    sampler = DiffusionSampler(
        model, 4, use_cache=True,
        cache_kwargs={
            "level": "score", "R": 8, "tau_0": 1e9,
            "eps_predictor": "freqca", "hermite_order": 1, "max_history": 4,
            "guard": "off",
        },
    )
    x = sampler.sample(4, 40, key=jax.random.PRNGKey(1))
    assert np.isfinite(x).all()
    state = sampler.last_cache_state
    stats = cache_stats(state)
    assert stats["steps_skipped_ratio"] > 0.5  # tau=inf → skip between refreshes
    assert int(state.hist_len) >= 2  # ring collected ≥2 refresh observations
    assert state.crf_high_hist.shape == (4, 4, 16, 1)  # (H, B, T, C)


def test_freqca_eps_predictor_validation():
    from fdtpu.sampling import DiffusionSampler
    import pytest

    model = _tiny_model()
    with pytest.raises(ValueError, match="score-level"):
        DiffusionSampler(
            model, 4, use_cache=True,
            cache_kwargs={"level": "token", "eps_predictor": "freqca"},
        )
    with pytest.raises(ValueError, match="taylor"):
        DiffusionSampler(
            model, 4, use_cache=True,
            cache_kwargs={"level": "score", "eps_predictor": "typo"},
        )
