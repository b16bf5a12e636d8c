"""End-to-end slice (SURVEY.md §7.4): synthetic data → VP-SDE transformer →
train → scan sampler → Wasserstein within tolerance.  Also covers
checkpointing round-trips and the data-parallel mesh path (8 virtual CPU
devices from conftest)."""


import jax
import numpy as np
import pytest

from fdtpu.data import SyntheticDatamodule
from fdtpu.diffusion import VPScheduler
from fdtpu.metrics import MarginalWasserstein, SlicedWasserstein
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.sampling import DiffusionSampler
from fdtpu.train import Trainer, get_best_checkpoint, get_training_params, load_checkpoint


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    run_dir = tmp_path_factory.mktemp("runs")

    # Time-domain standardized config: the setup where this model scale
    # genuinely learns a usable score.  (The frequency-domain path at this
    # tiny scale diverges identically in the torch reference — verified by
    # running the reference-equivalent pipeline side by side; full-scale
    # frequency-domain quality is validated in the benchmark CLI.)
    dm = SyntheticDatamodule(
        data_dir=data_dir, max_len=24, num_samples=512, batch_size=64,
        fourier_transform=False, standardize=True,
    )
    dm.prepare_data()
    dm.setup()

    max_epochs = 60
    params = get_training_params(dm, max_epochs=max_epochs)
    cfg = ScoreModelConfig(
        n_channels=params["n_channels"], max_len=params["max_len"],
        d_model=32, num_layers=2, n_head=4, dim_feedforward=128,
    )
    scheduler = VPScheduler(fourier_noise_scaling=False).with_noise_scaling(cfg.max_len)
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
        num_training_steps=params["num_training_steps"],
        lr_max=1e-3,
    )
    trainer = Trainer(max_epochs=max_epochs, run_dir=run_dir, seed=42)
    model = trainer.fit(model, dm)
    return model, dm, trainer


def test_training_reduces_loss(trained):
    _, _, trainer = trained
    import json

    records = [json.loads(l) for l in open(trainer.metrics_path)]
    val = [r["val/loss"] for r in records if "val/loss" in r]
    assert len(val) == 60
    assert min(val) < val[0], val


def test_checkpoint_roundtrip(trained):
    model, _, trainer = trained
    ckpt = get_best_checkpoint(trainer.run_dir / "checkpoints")
    restored = load_checkpoint(ckpt)
    assert restored.config == model.config
    for a, b in zip(
        jax.tree.leaves(restored.variables), jax.tree.leaves(model.variables)
    ):
        np.testing.assert_allclose(a, b)
    assert type(restored.scheduler).__name__ == "VPScheduler"
    assert restored.scheduler.fourier_noise_scaling == model.scheduler.fourier_noise_scaling
    np.testing.assert_allclose(restored.scheduler.G, model.scheduler.G)

    # Runtime config fields (kernel choice, compute dtype) can be replaced at
    # load time without touching the weights.
    patched = load_checkpoint(ckpt, attention_impl="auto")
    assert patched.config.attention_impl == "auto"
    assert patched.config.d_model == model.config.d_model
    import jax.numpy as jnp

    from fdtpu.models import score_apply

    x = jax.random.normal(jax.random.PRNGKey(0), (2, model.config.max_len, 1))
    t = jnp.full((2,), 0.5)

    np.testing.assert_allclose(
        score_apply(patched.variables, patched.config, x, t),
        score_apply(model.variables, model.config, x, t),
        atol=1e-5,
    )


def test_sampling_quality_after_training(trained):
    """Generated samples must beat the mean-only dummy baseline on sliced W₂."""
    model, dm, _ = trained
    sampler = DiffusionSampler(model, sample_batch_size=128)
    x = sampler.sample(128, num_diffusion_steps=100, key=jax.random.PRNGKey(5))

    from fdtpu.data import DiffusionDataset

    train_set = DiffusionDataset(X=dm.X_train, standardize=True)
    x_time = x * train_set.feature_std + train_set.feature_mean

    metric = SlicedWasserstein(
        original_samples=dm.X_train, random_seed=42, num_directions=100
    )
    result = metric(x_time)
    baselines = metric.baseline_metrics
    assert (
        result["sliced_wasserstein_mean"] < baselines["sliced_wasserstein_mean_dummy"]
    ), (result, baselines)


def test_cached_sampling_quality_matches_uncached(trained):
    """E²-CRF score-level caching on a *trained* model: marginal Wasserstein
    of cached samples within tolerance of uncached (BASELINE.json criterion)."""
    model, dm, _ = trained
    uncached = DiffusionSampler(model, sample_batch_size=128)
    cached = DiffusionSampler(
        model, sample_batch_size=128, use_cache=True,
        cache_kwargs={"level": "score", "R": 10, "tau_0": 0.05},
    )
    s_un = uncached.sample(128, 100, key=jax.random.PRNGKey(6))
    s_ca = cached.sample(128, 100, key=jax.random.PRNGKey(6))
    stats = cached.get_cache_stats()
    assert stats["steps_skipped_ratio"] > 0.3, stats

    m = MarginalWasserstein(original_samples=s_un, random_seed=42)
    delta = m(s_ca)["marginal_wasserstein_mean"]
    m_self = m(s_un[:64])["marginal_wasserstein_mean"]  # sampling-noise scale
    assert delta < max(2 * m_self, 0.1), (delta, m_self, stats)


def test_eps_extrapolation_improves_fidelity(trained):
    """First-order ε̂ extrapolation (eps_order=1) must track the uncached
    trajectory at least as well as frozen reuse (eps_order=0) at the same
    budget."""
    model, _, _ = trained
    uncached = DiffusionSampler(model, sample_batch_size=128)
    s_un = uncached.sample(128, 100, key=jax.random.PRNGKey(11))

    def deviation(order):
        cached = DiffusionSampler(
            model, sample_batch_size=128, use_cache=True,
            cache_kwargs={"level": "score", "R": 20, "tau_0": 0.3, "eps_order": order},
        )
        s_ca = cached.sample(128, 100, key=jax.random.PRNGKey(11))
        skipped = cached.get_cache_stats()["steps_skipped_ratio"]
        return np.linalg.norm(s_un - s_ca) / np.linalg.norm(s_un), skipped

    dev0, skip0 = deviation(0)
    dev1, skip1 = deviation(1)
    assert skip0 > 0.2 and skip1 > 0.2, (skip0, skip1)
    assert dev1 <= dev0 * 1.05, (dev0, dev1, skip0, skip1)
    # Quadratic (order 2, three-point Newton) must also beat frozen reuse
    # at this short-span budget; its known weakness is curvature blow-up
    # over LONG spans (e2crf.py eps_order docstring), not this regime.
    dev2, skip2 = deviation(2)
    assert skip2 > 0.2, skip2
    assert np.isfinite(dev2) and dev2 <= dev0 * 1.05, (dev0, dev2, skip2)


def test_ve_scheduler_trains_and_samples(tmp_path):
    """VE-SDE end to end: loss decreases, sampling stays finite and bounded."""
    from fdtpu.diffusion import VEScheduler

    dm = SyntheticDatamodule(
        data_dir=tmp_path / "data", max_len=24, num_samples=256, batch_size=64,
        standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    params = get_training_params(dm, max_epochs=10)
    cfg = ScoreModelConfig(
        n_channels=1, max_len=24, d_model=16, num_layers=1, n_head=2,
        dim_feedforward=32,
    )
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=VEScheduler(sigma_max=2.0).with_noise_scaling(24),
        num_training_steps=params["num_training_steps"],
    )
    trainer = Trainer(max_epochs=10, run_dir=tmp_path / "runs", seed=42, use_mesh=False)
    model = trainer.fit(model, dm)

    import json

    records = [json.loads(l) for l in open(trainer.metrics_path)]
    val = [r["val/loss"] for r in records if "val/loss" in r]
    assert min(val) < val[0]

    sampler = DiffusionSampler(
        model, sample_batch_size=32, use_cache=True,
        cache_kwargs={"level": "score", "R": 10, "tau_0": 0.1},
    )
    out = sampler.sample(32, 30, key=jax.random.PRNGKey(3))
    assert np.isfinite(out).all()


def test_likelihood_weighting_training(tmp_path):
    """likelihood_weighting=True trains without blowing up."""
    dm = SyntheticDatamodule(
        data_dir=tmp_path / "data", max_len=24, num_samples=128, batch_size=64,
        standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    cfg = ScoreModelConfig(
        n_channels=1, max_len=24, d_model=8, num_layers=1, n_head=2,
        dim_feedforward=16,
    )
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=VPScheduler().with_noise_scaling(24),
        num_training_steps=10,
        likelihood_weighting=True,
    )
    trainer = Trainer(max_epochs=3, run_dir=tmp_path / "runs", seed=42, use_mesh=False)
    model = trainer.fit(model, dm)
    assert np.isfinite(trainer.best_val_loss)
