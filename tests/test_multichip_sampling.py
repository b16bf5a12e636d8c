"""Data-parallel sampling over the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from fdtpu.diffusion import VPScheduler
from fdtpu.dist import create_mesh
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler

MAX_LEN, CHANNELS = 16, 2
TINY = dict(d_model=8, num_layers=2, n_head=4, dim_feedforward=32)


def make_model():
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    return ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN),
        num_training_steps=8,
    )


@pytest.mark.parametrize(
    "cache_kwargs",
    [None, {"level": "score", "R": 3, "tau_0": 0.05},
     {"level": "kv", "policy": "event", "K": 2, "R": 3}],
)
def test_mesh_sampling_matches_single_device(cache_kwargs):
    """Sharding the sample batch over 8 devices must not change the result."""
    model = make_model()
    mesh = create_mesh()
    kwargs = dict(use_cache=cache_kwargs is not None, cache_kwargs=cache_kwargs or {})

    single = DiffusionSampler(model, sample_batch_size=16, **kwargs)
    sharded = DiffusionSampler(model, sample_batch_size=16, mesh=mesh, **kwargs)

    s1 = single.sample(16, 8, key=jax.random.PRNGKey(1))
    s2 = sharded.sample(16, 8, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=1e-4)
    if cache_kwargs is not None:
        st1, st2 = single.get_cache_stats(), sharded.get_cache_stats()
        assert st1.keys() == st2.keys()
        for k in st1:
            # Counters must match exactly; float telemetry (guard error
            # sums) only up to cross-device reduction-order jitter.
            assert st1[k] == pytest.approx(st2[k], rel=1e-5), k


def test_mesh_sampling_multi_batch_score_level():
    """Regression: score-level cache with multiple sample batches (the
    cache-batch probe used to index a zero-size KV placeholder)."""
    model = make_model()
    sampler = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True,
        cache_kwargs={"level": "score", "R": 3, "tau_0": 0.05},
    )
    out = sampler.sample(24, 6, key=jax.random.PRNGKey(2))
    assert out.shape == (24, MAX_LEN, CHANNELS)
    assert np.isfinite(out).all()
