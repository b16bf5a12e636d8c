"""Score model tests (mirrors reference tests/test_score_models.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.diffusion import VPScheduler
from fdtpu.diffusion.losses import sde_loss
from fdtpu.models import (
    MODE_CACHED,
    MODE_FULL,
    ScoreModelConfig,
    init_score_model,
    param_count,
    score_apply,
    score_apply_cached,
)

MAX_LEN, CHANNELS, BATCH = 20, 3, 12
TINY = dict(d_model=8, num_layers=2, n_head=4, dim_feedforward=32)


@pytest.mark.parametrize("backbone", ["transformer", "mlp", "lstm"])
def test_forward_shape(backbone):
    cfg = ScoreModelConfig(
        n_channels=CHANNELS, max_len=MAX_LEN, backbone=backbone, d_mlp=16, **TINY
    )
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, MAX_LEN, CHANNELS))
    t = jax.random.uniform(jax.random.PRNGKey(2), (BATCH,))
    score = score_apply(variables, cfg, x, t)
    assert score.shape == x.shape
    assert not np.isnan(np.asarray(score)).any()


def test_flagship_param_count_matches_reference():
    """≈3.2M params at d_model=72, 10 layers, 12 heads (SURVEY.md §6)."""
    cfg = ScoreModelConfig(n_channels=1, max_len=187)
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    n = param_count(variables)
    assert 3.0e6 < n < 3.5e6, n


@pytest.mark.parametrize("backbone", ["transformer", "mlp", "lstm"])
def test_all_parameters_receive_gradient(backbone):
    """Every trainable parameter gets a nonzero gradient (reference
    tests/test_score_models.py:62-89 'every parameter changed after training')."""
    cfg = ScoreModelConfig(
        n_channels=CHANNELS, max_len=MAX_LEN, backbone=backbone, d_mlp=16, **TINY
    )
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, MAX_LEN, CHANNELS))

    def apply_fn(params, xn, t, train, rngs):
        return score_apply(
            {"params": params, "constants": variables["constants"]},
            cfg, xn, t, train=train, rngs=rngs,
        )

    def loss(params):
        return sde_loss(apply_fn, params, sde, x, jax.random.PRNGKey(2), train=True)

    grads = jax.grad(loss)(variables["params"])
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    for path, g in flat:
        assert float(jnp.abs(g).max()) > 0, f"zero gradient at {jax.tree_util.keystr(path)}"


def test_deterministic_eval():
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, MAX_LEN, CHANNELS))
    t = jnp.full((2,), 0.5)
    s1 = score_apply(variables, cfg, x, t)
    s2 = score_apply(variables, cfg, x, t)
    np.testing.assert_allclose(s1, s2)


def test_cached_full_mode_matches_uncached():
    """MODE_FULL through the cached path must equal the plain forward."""
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, MAX_LEN, CHANNELS))
    t = jnp.full((2,), 0.3)

    kv = (
        jnp.zeros((cfg.num_layers, 2, MAX_LEN, cfg.n_head, cfg.head_dim)),
        jnp.zeros((cfg.num_layers, 2, MAX_LEN, cfg.n_head, cfg.head_dim)),
    )
    mask = jnp.ones((MAX_LEN,), dtype=bool)
    score_cached, kv_new, crf = score_apply_cached(
        variables, cfg, x, t, kv, mask, MODE_FULL
    )
    score_plain = score_apply(variables, cfg, x, t)
    np.testing.assert_allclose(score_cached, score_plain, atol=1e-5)
    assert crf.shape == (cfg.num_layers, MAX_LEN, cfg.d_model)
    assert float(jnp.abs(kv_new[0]).max()) > 0


def test_cached_pure_cache_mode_reuses_kv():
    """MODE_CACHED with KV from a previous full pass on the SAME input must
    reproduce the full-pass output (KV of unchanged tokens are exact)."""
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, MAX_LEN, CHANNELS))
    t = jnp.full((2,), 0.3)

    kv0 = (
        jnp.zeros((cfg.num_layers, 2, MAX_LEN, cfg.n_head, cfg.head_dim)),
        jnp.zeros((cfg.num_layers, 2, MAX_LEN, cfg.n_head, cfg.head_dim)),
    )
    mask = jnp.ones((MAX_LEN,), dtype=bool)
    score_full, kv_full, _ = score_apply_cached(variables, cfg, x, t, kv0, mask, MODE_FULL)
    score_cached, kv_after, _ = score_apply_cached(
        variables, cfg, x, t, kv_full, jnp.zeros((MAX_LEN,), dtype=bool), MODE_CACHED
    )
    np.testing.assert_allclose(score_cached, score_full, atol=1e-5)
    # Pure-cache mode must not alter the carried KV.
    np.testing.assert_allclose(kv_after[0], kv_full[0], atol=1e-6)


def test_cached_mode_switch_traced():
    """lax.switch over a traced mode scalar compiles and matches the static path."""
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, **TINY)
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, MAX_LEN, CHANNELS))
    t = jnp.full((1,), 0.3)
    kv = (
        jnp.zeros((cfg.num_layers, 1, MAX_LEN, cfg.n_head, cfg.head_dim)),
        jnp.zeros((cfg.num_layers, 1, MAX_LEN, cfg.n_head, cfg.head_dim)),
    )
    mask = jnp.ones((MAX_LEN,), dtype=bool)

    @jax.jit
    def f(mode):
        return score_apply_cached(variables, cfg, x, t, kv, mask, mode)[0]

    np.testing.assert_allclose(
        f(jnp.asarray(MODE_FULL)),
        score_apply_cached(variables, cfg, x, t, kv, mask, MODE_FULL)[0],
        atol=1e-5,
    )


def test_dropout_active_in_train_mode():
    cfg = ScoreModelConfig(n_channels=CHANNELS, max_len=MAX_LEN, dropout=0.5, **TINY)
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, MAX_LEN, CHANNELS))
    t = jnp.full((2,), 0.5)
    s1 = score_apply(variables, cfg, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(10)})
    s2 = score_apply(variables, cfg, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(11)})
    assert float(jnp.abs(s1 - s2).max()) > 1e-6
