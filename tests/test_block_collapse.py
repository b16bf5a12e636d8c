"""Block-collapsed skip execution (E2CRFConfig.block_size > 1).

Three layers of evidence:
* `collapse_skip_span` reproduces k sequential `scheduler.step` calls
  exactly (same scores/noises fed both ways) — the affine-telescope math.
* The block-mode sampler reproduces per-step execution END TO END: it
  replicates the per-step PRNG stream bit-exactly (unrolled key splits +
  batched normal draws), so values match up to float reassociation and
  every policy decision/counter is identical.
* Composition with the device-resident grouped path and the level guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.diffusion import VEScheduler, VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler
from fdtpu.sampling.sampler import collapse_skip_span

MAX_LEN, CHANNELS = 16, 2
TINY = dict(d_model=8, num_layers=2, n_head=4, dim_feedforward=32)


def make_model(scheduler=None):
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    scheduler = scheduler or VPScheduler(
        fourier_noise_scaling=True
    ).with_noise_scaling(MAX_LEN)
    return ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
        num_training_steps=8,
    )


@pytest.mark.parametrize(
    "scheduler",
    [
        VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN),
        VPScheduler(fourier_noise_scaling=False).with_noise_scaling(MAX_LEN),
        VEScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN),
    ],
)
def test_collapse_matches_sequential_steps(scheduler):
    """X = collapse(k steps) == step(step(...step(x)...)) with the same
    per-step scores and noises."""
    k, B = 7, 4
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(keys[0], (B, MAX_LEN, CHANNELS))
    scores = 0.1 * jax.random.normal(keys[1], (k, B, MAX_LEN, CHANNELS))
    zs = jax.random.normal(keys[2], (k, B, MAX_LEN, CHANNELS))
    ts, h = scheduler.timesteps(50)
    t_blk = ts[10 : 10 + k]

    seq = x
    for i in range(k):
        seq = scheduler.step(scores[i], t_blk[i], seq, zs[i], h)

    coll = collapse_skip_span(scheduler, x, scores, zs, t_blk, h)
    np.testing.assert_allclose(np.asarray(coll), np.asarray(seq),
                               rtol=2e-5, atol=2e-5)


def test_batched_normal_draw_matches_sequential_splits():
    """The fast path's PRNG replication trick: vmapped normal over stacked
    keys must produce the same bits as per-key normal calls."""
    key = jax.random.PRNGKey(7)
    keys, shape = [], (3, 5)
    seq = []
    for _ in range(4):
        key, kn = jax.random.split(key)
        keys.append(kn)
        seq.append(jax.random.normal(kn, shape))
    batched = jax.vmap(lambda kk: jax.random.normal(kk, shape))(jnp.stack(keys))
    np.testing.assert_array_equal(np.asarray(batched), np.stack(seq))


@pytest.mark.parametrize("eps_order", [0, 1, 2])
@pytest.mark.parametrize("steps,block", [(24, 4), (25, 4), (30, 8)])
def test_block_mode_matches_per_step(eps_order, steps, block):
    """End-to-end equivalence: same values (up to reassociation), same
    policy trajectory, same counters — including block tails and
    calibration steps."""
    model = make_model()
    base = {"level": "score", "R": 6, "tau_0": 0.05, "eps_order": eps_order}
    per_step = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True, cache_kwargs=base
    )
    blocked = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True,
        cache_kwargs=dict(base, block_size=block),
    )
    s1 = per_step.sample(8, steps, key=jax.random.PRNGKey(1))
    s2 = blocked.sample(8, steps, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=2e-4)
    st1, st2 = per_step.get_cache_stats(), blocked.get_cache_stats()
    assert st1.keys() == st2.keys()
    for key in ("full_steps", "cached_steps", "mixed_steps",
                "steps_skipped_ratio", "guard_measurements"):
        assert st1[key] == pytest.approx(st2[key]), key
    assert st1["budget_overrun_ratio"] == pytest.approx(
        st2["budget_overrun_ratio"], rel=1e-3, abs=1e-6
    )


def test_block_mode_multi_batch_cache_persistence():
    """Quirk Q5 across batches with block mode on both sides."""
    model = make_model()
    base = {"level": "score", "R": 6, "tau_0": 0.05}
    per_step = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True, cache_kwargs=base
    )
    blocked = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True,
        cache_kwargs=dict(base, block_size=4),
    )
    s1 = per_step.sample(24, 12, key=jax.random.PRNGKey(9))
    s2 = blocked.sample(24, 12, key=jax.random.PRNGKey(9))
    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=2e-4)
    assert per_step.get_cache_stats()["full_steps"] == \
        blocked.get_cache_stats()["full_steps"]


def test_block_mode_composes_with_resident_grouping():
    model = make_model()
    kwargs = dict(
        use_cache=True,
        cache_kwargs={"level": "score", "R": 6, "tau_0": 0.05, "block_size": 4},
    )
    single = DiffusionSampler(model, sample_batch_size=8, **kwargs)
    grouped = DiffusionSampler(
        model, sample_batch_size=8, batches_per_call=2, **kwargs
    )
    s1 = single.sample(16, 12, key=jax.random.PRNGKey(2))
    s2 = grouped.sample(16, 12, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=2e-4)
    st1, st2 = single.get_cache_stats(), grouped.get_cache_stats()
    assert st1["full_steps"] == st2["full_steps"]
    assert st1["cached_steps"] == st2["cached_steps"]


def test_block_mode_with_fresca_matches_per_step():
    """FreSca is linear in the score, so it vectorizes into collapsed
    spans; values must still match per-step execution."""
    model = make_model()
    base = {"level": "score", "R": 6, "tau_0": 0.05}
    kw = dict(use_fresca=True, fresca_low_scale=0.9, fresca_high_scale=1.4)
    per_step = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True, cache_kwargs=base, **kw
    )
    blocked = DiffusionSampler(
        model, sample_batch_size=8, use_cache=True,
        cache_kwargs=dict(base, block_size=4), **kw
    )
    s1 = per_step.sample(8, 16, key=jax.random.PRNGKey(4))
    s2 = blocked.sample(8, 16, key=jax.random.PRNGKey(4))
    np.testing.assert_allclose(s1, s2, rtol=2e-4, atol=2e-4)


def test_block_size_requires_score_level():
    model = make_model()
    with pytest.raises(ValueError, match="score-level"):
        DiffusionSampler(
            model, sample_batch_size=8, use_cache=True,
            cache_kwargs={"level": "token", "token_budget": 4, "block_size": 4},
        )
