"""Mixed-precision (bfloat16 backbone) correctness tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fdtpu.models import ScoreModelConfig, init_score_model, score_apply

MAX_LEN, CHANNELS = 20, 3
TINY = dict(d_model=8, num_layers=2, n_head=4, dim_feedforward=32)


def test_bf16_forward_close_to_fp32():
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    cfg_bf16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, MAX_LEN, CHANNELS))
    t = jnp.full((4,), 0.5)

    s32 = score_apply(variables, cfg, x, t)
    s16 = score_apply(variables, cfg_bf16, x, t)
    assert s16.dtype == jnp.float32  # output stays float32
    rel = float(jnp.linalg.norm(s32 - s16) / jnp.linalg.norm(s32))
    assert rel < 0.05, rel


def test_bf16_cached_sampling_runs():
    from fdtpu.diffusion import VPScheduler
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.sampling import DiffusionSampler

    cfg = ScoreModelConfig(
        n_channels=CHANNELS, max_len=MAX_LEN, compute_dtype="bfloat16", **TINY
    )
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    model = ScoreModel(config=cfg, variables=variables, scheduler=sde, num_training_steps=10)

    for kwargs in (
        {},
        dict(use_cache=True, cache_kwargs={"level": "score", "R": 4, "tau_0": 0.05}),
        dict(use_cache=True, cache_kwargs={"level": "kv", "policy": "event", "K": 2, "R": 4}),
    ):
        sampler = DiffusionSampler(model, sample_batch_size=4, **kwargs)
        out = sampler.sample(4, 8, key=jax.random.PRNGKey(2))
        assert out.dtype == np.float32
        assert np.isfinite(out).all()
