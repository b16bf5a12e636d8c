"""Gradient accumulation (optax.MultiSteps) + LR logging.

Reference semantics: Lightning's ``accumulate_grad_batches`` divides the
schedule length (reference extraction.py:12-17) and LearningRateMonitor logs
the LR (conf/trainer/callbacks/default.yaml:1)."""

import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fdtpu.data import SyntheticDatamodule
from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.train import Trainer, get_training_params
from fdtpu.train.state import make_lr_schedule, make_optimizer


def _tree_allclose(a, b, rtol=1e-5, atol=1e-7):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_multisteps_accumulation_equals_mean_grad_step():
    """k micro-grads through MultiSteps(k) ≡ one step on their mean —
    the k-step ≡ k×batch equivalence at the optimizer level (DSM-loss grads
    of a k×batch are exactly the mean of the k micro-batch grads)."""
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    g1 = jax.tree.map(lambda p: jnp.full_like(p, 0.1), params)
    g2 = jax.tree.map(lambda p: jnp.full_like(p, 0.3), params)
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    acc_tx = make_optimizer(
        lr_max=1e-3, num_training_steps=100, accumulate_grad_batches=2
    )
    acc_state = acc_tx.init(params)
    p_acc = params
    for g in (g1, g2):
        updates, acc_state = acc_tx.update(g, acc_state, p_acc)
        p_acc = optax.apply_updates(p_acc, updates)

    base_tx = make_optimizer(lr_max=1e-3, num_training_steps=100)
    base_state = base_tx.init(params)
    updates, _ = base_tx.update(g_mean, base_state, params)
    p_base = optax.apply_updates(params, updates)

    _tree_allclose(p_acc, p_base)


def test_multisteps_schedule_advances_once_per_k():
    """The inner schedule position must advance once per k micro-steps —
    after 2k micro-batches both optimizers sit at inner step 2."""
    params = {"w": jnp.ones((4,))}
    g = {"w": jnp.full((4,), 0.2)}
    k = 3
    tx = make_optimizer(lr_max=1e-3, num_training_steps=10, accumulate_grad_batches=k)
    state = tx.init(params)
    p = params
    for _ in range(2 * k):
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)
    assert int(state.mini_step) == 0
    assert int(state.gradient_step) == 2


def test_trainer_accumulation_e2e_and_lr_logged():
    cfg = ScoreModelConfig(
        n_channels=1, max_len=24, d_model=8, num_layers=2, n_head=4,
        dim_feedforward=16,
    )
    sched = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(24)
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=sched,
    )
    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=24, num_samples=64, batch_size=16,
        fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    model.num_training_steps = get_training_params(
        dm, max_epochs=2, accumulate_grad_batches=2
    )["num_training_steps"]

    run_dir = tempfile.mkdtemp()
    trainer = Trainer(
        max_epochs=2, run_dir=run_dir, seed=0, log_every_n_steps=1,
        accumulate_grad_batches=2,
    )
    before = jax.tree.map(np.copy, model.variables["params"])
    model = trainer.fit(model, dm)
    after = model.variables["params"]
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    assert changed
    records = [
        json.loads(line)
        for line in open(trainer.metrics_path).read().splitlines()
    ]
    lrs = [r["lr"] for r in records if "lr" in r]
    assert lrs, "lr must be logged"
    assert all(np.isfinite(lrs))
    # warmup: LR should rise over the first logged steps
    assert lrs[1] >= lrs[0]


def test_lr_schedule_shape():
    s = make_lr_schedule(lr_max=1e-3, num_training_steps=100)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-3) < 1e-9  # warmup peak at 10% of steps
    assert float(s(100)) < 1e-5  # decayed to ~0
