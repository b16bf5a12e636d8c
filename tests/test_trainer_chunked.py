"""Chunked multi-step training dispatch (``Trainer(steps_per_call=k)``).

The scanned path must reproduce the per-step path exactly: same per-step
PRNG key sequence, same batch order, same optimizer trajectory.  Covers
the uneven case (a trailing partial batch that falls back to the
single-step dispatch) and the logging/metrics parity.
"""

import json

import jax
import numpy as np
import pytest

from fdtpu.data import SyntheticDatamodule
from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.train import Trainer, get_training_params


def _train(tmp_path, data_dir, steps_per_call: int, max_epochs: int = 2):
    # 144 samples / batch 32 -> 4 full batches + one partial (16): the
    # chunked path scans the 4 full ones and single-steps the remainder.
    dm = SyntheticDatamodule(
        data_dir=data_dir, max_len=24, num_samples=160, batch_size=32,
        fourier_transform=False, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    params = get_training_params(dm, max_epochs=max_epochs)
    cfg = ScoreModelConfig(
        n_channels=params["n_channels"], max_len=params["max_len"],
        d_model=16, num_layers=1, n_head=2, dim_feedforward=32,
    )
    scheduler = VPScheduler(fourier_noise_scaling=False).with_noise_scaling(
        cfg.max_len
    )
    model = ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=scheduler,
        num_training_steps=params["num_training_steps"],
    )
    trainer = Trainer(
        max_epochs=max_epochs, run_dir=tmp_path / f"spc{steps_per_call}",
        seed=42, steps_per_call=steps_per_call, log_every_n_steps=1,
    )
    model = trainer.fit(model, dm)
    return model, trainer


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunked")
    data_dir = tmp_path_factory.mktemp("data")
    return (
        _train(tmp, data_dir, steps_per_call=1),
        _train(tmp, data_dir, steps_per_call=16),
    )


def test_same_final_params(both):
    (m1, _), (mk, _) = both
    for a, b in zip(
        jax.tree.leaves(m1.variables["params"]),
        jax.tree.leaves(mk.variables["params"]),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_same_per_step_losses(both):
    (_, t1), (_, tk) = both
    step_losses = {}
    for t in (t1, tk):
        recs = [json.loads(line) for line in open(t.metrics_path)]
        step_losses[t] = {
            r["step"]: r["train/loss"] for r in recs if "train/loss" in r
        }
    assert step_losses[t1].keys() == step_losses[tk].keys()
    for s in step_losses[t1]:
        np.testing.assert_allclose(
            step_losses[t1][s], step_losses[tk][s], rtol=2e-4,
            err_msg=f"step {s}",
        )


def test_val_loss_matches(both):
    (_, t1), (_, tk) = both
    assert t1.best_val_loss == pytest.approx(tk.best_val_loss, rel=2e-4)
