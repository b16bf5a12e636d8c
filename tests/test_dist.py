"""Mesh / sharding tests on the virtual 8-device CPU mesh (SURVEY.md §2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdtpu.dist import MeshConfig, create_mesh, replicate, shard_batch
from fdtpu.dist.mesh import pad_to_multiple


def test_mesh_covers_all_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 8


def test_mesh_config_model_axis():
    mesh = create_mesh(MeshConfig(model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        MeshConfig(data=3, model=2).resolve(8)


def test_shard_batch_places_on_all_devices():
    mesh = create_mesh()
    batch = np.arange(8 * 4 * 2, dtype=np.float32).reshape(8, 4, 2)
    sharded = shard_batch(mesh, batch)
    assert len(sharded.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded), batch)


def test_replicate():
    mesh = create_mesh()
    tree = {"a": jnp.ones((3, 3)), "b": jnp.zeros((2,))}
    rep = replicate(mesh, tree)
    assert rep["a"].sharding.is_fully_replicated


def test_pad_to_multiple():
    x = np.ones((10, 3))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape[0] == 16 and n == 10
    same, n2 = pad_to_multiple(np.ones((16, 3)), 8)
    assert same.shape[0] == 16 and n2 == 16


def test_data_parallel_loss_matches_single_device():
    """The sharded jitted loss must equal the unsharded one."""
    from fdtpu.diffusion import VPScheduler
    from fdtpu.diffusion.losses import sde_loss
    from fdtpu.models import ScoreModelConfig, init_score_model, score_apply

    cfg = ScoreModelConfig(
        n_channels=2, max_len=16, d_model=8, num_layers=1, n_head=2,
        dim_feedforward=16,
    )
    variables = init_score_model(jax.random.PRNGKey(0), cfg)
    sde = VPScheduler().with_noise_scaling(16)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 2))

    def apply_fn(params, xn, t, train, rngs):
        return score_apply(
            {"params": params, "constants": variables["constants"]}, cfg, xn, t,
            train=train, rngs=rngs,
        )

    def loss_fn(params, batch):
        return sde_loss(apply_fn, params, sde, batch, jax.random.PRNGKey(2), train=False)

    single = jax.jit(loss_fn)(variables["params"], x)

    mesh = create_mesh()
    params_rep = replicate(mesh, variables["params"])
    x_sharded = shard_batch(mesh, x)
    sharded = jax.jit(loss_fn)(params_rep, x_sharded)
    np.testing.assert_allclose(float(single), float(sharded), rtol=1e-5)


def test_trainer_tp_mesh_matches_data_only():
    """User-facing Trainer over a dp=4 × tp=2 mesh (tensor-parallel FFN +
    attention via tp_param_spec) must reproduce the data-only mesh run."""
    import tempfile

    from fdtpu.data import SyntheticDatamodule
    from fdtpu.diffusion import VPScheduler
    from fdtpu.models import ScoreModelConfig, init_score_model
    from fdtpu.models.score_models import ScoreModel
    from fdtpu.train import Trainer

    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=16, num_samples=64,
        batch_size=16, fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    cfg = ScoreModelConfig(
        n_channels=1, max_len=16, d_model=8, num_layers=2, n_head=2,
        dim_feedforward=16,
    )
    sde = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(16)

    def fresh():
        return ScoreModel(
            config=cfg, variables=init_score_model(jax.random.PRNGKey(0), cfg),
            scheduler=sde, num_training_steps=8,
        )

    t_dp = Trainer(
        max_epochs=1, run_dir=tempfile.mkdtemp(), seed=1,
        save_resume_state=False,
    )
    m_dp = t_dp.fit(fresh(), dm)

    mesh = create_mesh(MeshConfig(model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    t_tp = Trainer(
        max_epochs=1, run_dir=tempfile.mkdtemp(), seed=1, mesh=mesh,
        save_resume_state=False,
    )
    m_tp = t_tp.fit(fresh(), dm)

    assert np.isfinite(t_tp.best_val_loss)
    np.testing.assert_allclose(
        t_tp.best_val_loss, t_dp.best_val_loss, rtol=1e-4
    )
    for x, y in zip(
        jax.tree.leaves(m_dp.variables["params"]),
        jax.tree.leaves(m_tp.variables["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5
        )


def test_graft_entry_contract():
    """The driver contract: entry() compiles; dryrun_multichip(8) runs."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape

    mod.dryrun_multichip(8)


@pytest.mark.parametrize("n", [1, 2, 3, 6, 8])
def test_dryrun_multichip_device_counts(n):
    """The driver may probe various device counts; all must compile+run."""
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry_n", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(n)
