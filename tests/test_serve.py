"""AOT export (fdtpu.serve): serialized sampling programs round-trip and
reproduce DiffusionSampler.sample exactly (same key schedule)."""

import jax
import numpy as np

from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler
from fdtpu.serve import export_sampler, load_exported


def _tiny_model(max_len=16, n_channels=2):
    cfg = ScoreModelConfig(
        n_channels=n_channels, max_len=max_len, d_model=12, num_layers=2,
        n_head=2, dim_feedforward=24,
    )
    scheduler = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(
        max_len
    )
    return ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
    )


def test_export_roundtrip_matches_sampler(tmp_path):
    model = _tiny_model()
    sampler = DiffusionSampler(model, sample_batch_size=4)
    path = tmp_path / "sampler.stablehlo"
    meta = export_sampler(sampler, num_diffusion_steps=8, path=path)
    assert meta["format"] == "jax.export/stablehlo"
    assert (tmp_path / "sampler.stablehlo.json").exists()

    fn = load_exported(path)
    key = jax.random.PRNGKey(7)
    got = np.asarray(fn(key))
    want = sampler.sample(4, 8, key=key)
    assert got.shape == (4, 16, 2)
    # Two separately-jitted compilations of the same chain differ by
    # ~3e-5/element (fusion jitter, see CLAUDE.md); the export layer itself
    # is bit-exact vs a direct jit of the same closure.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5)


def test_export_cached_sampler(tmp_path):
    model = _tiny_model()
    sampler = DiffusionSampler(
        model, sample_batch_size=4, use_cache=True,
        cache_kwargs={"level": "score", "R": 4, "tau_0": 1.0},
    )
    path = tmp_path / "cached.stablehlo"
    meta = export_sampler(sampler, num_diffusion_steps=8, path=path)
    assert meta["use_cache"] and meta["cache_kwargs"]["level"] == "score"

    fn = load_exported(path)
    key = jax.random.PRNGKey(3)
    got = np.asarray(fn(key))
    sampler.last_cache_state = None
    want = sampler.sample(4, 8, key=key)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5)
    # A second call with a fresh key runs the baked program stand-alone.
    other = np.asarray(fn(jax.random.PRNGKey(4)))
    assert np.isfinite(other).all() and not np.allclose(other, got)
