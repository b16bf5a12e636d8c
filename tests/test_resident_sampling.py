"""Device-resident multi-batch sampling (``batches_per_call`` > 1).

The resident path scans whole trajectories inside one jitted dispatch; it
must reproduce the per-batch host loop exactly — same per-batch PRNG
sequence, same cross-batch cache persistence (quirk Q5), same guard
telemetry — for every cache level and for ``reset_between_batches``.
"""

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


CACHE_CASES = [
    None,
    {"level": "score", "R": 3, "tau_0": 0.05},
    {"level": "token", "R": 3, "tau_0": 0.05, "token_budget": 4},
    {"level": "kv", "policy": "event", "K": 2, "R": 3, "tau_0": 1.0},
    {"level": "score", "R": 3, "tau_0": 0.05, "reset_between_batches": True},
]


@pytest.mark.parametrize("cache_kwargs", CACHE_CASES)
def test_resident_matches_host_loop(cache_kwargs):
    """4 batches in one dispatch == 4 per-batch dispatches, values + stats."""
    model = make_model()
    kwargs = dict(use_cache=cache_kwargs is not None, cache_kwargs=cache_kwargs or {})

    host = DiffusionSampler(model, sample_batch_size=8, **kwargs)
    resident = DiffusionSampler(
        model, sample_batch_size=8, batches_per_call=4, **kwargs
    )

    s1 = host.sample(32, 6, key=jax.random.PRNGKey(1))
    s2 = resident.sample(32, 6, key=jax.random.PRNGKey(1))
    assert s1.shape == s2.shape == (32, MAX_LEN, CHANNELS)
    np.testing.assert_allclose(s1, s2, rtol=2e-5, atol=5e-5)

    if cache_kwargs is not None:
        st1, st2 = host.get_cache_stats(), resident.get_cache_stats()
        assert st1.keys() == st2.keys()
        for k in st1:
            assert st1[k] == pytest.approx(st2[k], rel=1e-5), k


def test_resident_group_boundary_matches_host_loop():
    """batches_per_call smaller than num_batches: the carry (PRNG key + cache
    state) must thread across group dispatches exactly like the host loop."""
    model = make_model()
    kwargs = dict(
        use_cache=True, cache_kwargs={"level": "score", "R": 3, "tau_0": 0.05}
    )
    host = DiffusionSampler(model, sample_batch_size=8, **kwargs)
    grouped = DiffusionSampler(
        model, sample_batch_size=8, batches_per_call=2, **kwargs
    )
    s1 = host.sample(40, 6, key=jax.random.PRNGKey(3))  # 5 batches: 2+2+1
    s2 = grouped.sample(40, 6, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(s1, s2, rtol=2e-5, atol=5e-5)
    st1, st2 = host.get_cache_stats(), grouped.get_cache_stats()
    for k in st1:
        assert st1[k] == pytest.approx(st2[k], rel=1e-5), k


def test_resident_bf16_matches_host_loop():
    """Mixed-precision model through the resident path: the variable cast
    happens once outside the scan on both paths (shared _cast_variables)."""
    cfg = ScoreModelConfig(
        n_channels=CHANNELS, max_len=MAX_LEN, compute_dtype="bfloat16", **TINY
    )
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN),
        num_training_steps=8,
    )
    kwargs = dict(
        use_cache=True, cache_kwargs={"level": "score", "R": 3, "tau_0": 0.05}
    )
    host = DiffusionSampler(model, sample_batch_size=8, **kwargs)
    resident = DiffusionSampler(
        model, sample_batch_size=8, batches_per_call=3, **kwargs
    )
    s1 = host.sample(24, 6, key=jax.random.PRNGKey(1))
    s2 = resident.sample(24, 6, key=jax.random.PRNGKey(1))
    # bf16 forward → looser tolerance; trajectories must still agree.
    np.testing.assert_allclose(s1, s2, rtol=2e-2, atol=2e-2)
    st1, st2 = host.get_cache_stats(), resident.get_cache_stats()
    assert st1["full_steps"] == st2["full_steps"]


def test_resident_single_batch_falls_back():
    """num_samples <= batch uses the host path (no grouping possible)."""
    model = make_model()
    s = DiffusionSampler(model, sample_batch_size=8, batches_per_call=4)
    out = s.sample(8, 4, key=jax.random.PRNGKey(0))
    assert out.shape == (8, MAX_LEN, CHANNELS)


def test_resident_on_mesh_matches_single_device():
    """Resident grouping composes with data-parallel mesh sharding."""
    model = make_model()
    kwargs = dict(
        use_cache=True, cache_kwargs={"level": "score", "R": 3, "tau_0": 0.05}
    )
    mesh = create_mesh()
    plain = DiffusionSampler(model, sample_batch_size=16, **kwargs)
    sharded = DiffusionSampler(
        model, sample_batch_size=16, mesh=mesh, batches_per_call=2, **kwargs
    )
    s1 = plain.sample(32, 6, key=jax.random.PRNGKey(1))
    s2 = sharded.sample(32, 6, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=1e-4)


def test_resident_guard_still_fires():
    """The collapse guard reads the final carried state, so a collapsing
    operating point must still warn through the resident path."""
    model = make_model()
    sampler = DiffusionSampler(
        model,
        sample_batch_size=8,
        batches_per_call=2,
        use_cache=True,
        # Pure periodic refresh with a long interval: skips almost
        # everything, realized error blows past the predicted budget
        # (same operating point as tests/test_guard.py).
        cache_kwargs={
            "level": "score",
            "R": 50,
            "tau_0": 1e9,
            "guard": "warn",
        },
    )
    with pytest.warns(UserWarning, match="error-budget guard"):
        sampler.sample(16, 120, key=jax.random.PRNGKey(2))
