"""Device-resident training loop (Trainer(epochs_per_call>1)).

The device loop's trajectory is defined by the carried PRNG key chain, so it
must be invariant to how epochs are chunked into calls, reproduce partial
batches exactly via zero-weight padding, and resume losslessly from call
boundaries.
"""

import json
import tempfile

import jax
import numpy as np
import pytest

from fdtpu.data import SyntheticDatamodule
from fdtpu.diffusion.sde import VPScheduler
from fdtpu.models.score_models import ScoreModel, ScoreModelConfig, init_score_model
from fdtpu.train import Trainer
from fdtpu.train.trainer import get_training_params

MAX_LEN = 16


def _dm(num_samples=96, batch_size=32):
    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=MAX_LEN,
        num_samples=num_samples, batch_size=batch_size,
        fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    return dm


def _model(dm, max_epochs):
    cfg = ScoreModelConfig(
        n_channels=1, max_len=MAX_LEN, d_model=16, num_layers=2, n_head=4
    )
    sch = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(MAX_LEN)
    steps = get_training_params(dm, max_epochs=max_epochs)["num_training_steps"]
    return ScoreModel(
        config=cfg,
        variables=init_score_model(jax.random.PRNGKey(0), cfg),
        scheduler=sch,
        num_training_steps=steps,
    )


def _epoch_losses(metrics_path):
    out = {}
    for line in open(metrics_path).read().splitlines():
        rec = json.loads(line)
        if "train/loss_epoch" in rec:
            out[rec["epoch"]] = (rec["train/loss_epoch"], rec["val/loss"])
    return out


def test_device_mode_invariant_to_epochs_per_call():
    dm = _dm()
    runs = {}
    for k in (2, 3):
        tr = Trainer(
            max_epochs=4, run_dir=tempfile.mkdtemp(), seed=0,
            epochs_per_call=k, use_mesh=False, save_resume_state=False,
        )
        tr.fit(_model(dm, 4), dm)
        runs[k] = _epoch_losses(tr.metrics_path)
    for epoch in range(4):
        np.testing.assert_allclose(
            runs[2][epoch], runs[3][epoch], rtol=1e-5, atol=1e-7,
            err_msg=f"epoch {epoch} depends on epochs_per_call chunking",
        )


def test_device_mode_partial_batch_and_best_checkpoint():
    # 80 samples at batch 32 -> last batch has 16 real rows (zero-weight pad).
    dm = _dm(num_samples=80, batch_size=32)
    tr = Trainer(
        max_epochs=3, run_dir=tempfile.mkdtemp(), seed=0,
        epochs_per_call=3, use_mesh=False, save_resume_state=False,
    )
    model = tr.fit(_model(dm, 3), dm)
    assert np.isfinite(tr.best_val_loss)
    assert tr.best_checkpoint is not None
    losses = _epoch_losses(tr.metrics_path)
    assert len(losses) == 3
    assert all(np.isfinite(v) for pair in losses.values() for v in pair)
    assert np.isfinite(
        np.asarray(jax.tree.leaves(model.variables["params"])[0])
    ).all()
    # Best val loss equals the minimum logged per-epoch val loss.
    min_val = min(v for _, v in losses.values())
    np.testing.assert_allclose(tr.best_val_loss, min_val, rtol=1e-6)


def test_device_mode_resume_reproduces_trajectory():
    dm = _dm()
    d_full = tempfile.mkdtemp()
    t_full = Trainer(
        max_epochs=4, run_dir=d_full, run_id="run", seed=0, epochs_per_call=2,
        use_mesh=False,
    )
    t_full.fit(_model(dm, 4), dm)
    full = _epoch_losses(t_full.metrics_path)

    d_part = tempfile.mkdtemp()
    t_a = Trainer(
        max_epochs=2, run_dir=d_part, run_id="run", seed=0, epochs_per_call=2,
        use_mesh=False,
    )
    t_a.fit(_model(dm, 4), dm)
    t_b = Trainer(
        max_epochs=4, run_dir=d_part, run_id="run", seed=0, epochs_per_call=2,
        use_mesh=False, resume=True,
    )
    t_b.fit(_model(dm, 4), dm)
    part = _epoch_losses(t_b.metrics_path)

    for epoch in range(4):
        np.testing.assert_allclose(
            part[epoch], full[epoch], rtol=1e-5, atol=1e-7,
            err_msg=f"epoch {epoch} diverged after device-mode resume",
        )


def test_device_mode_runs_on_mesh():
    dm = _dm(num_samples=128, batch_size=32)
    tr = Trainer(
        max_epochs=2, run_dir=tempfile.mkdtemp(), seed=0, epochs_per_call=2,
        save_resume_state=False,  # default data mesh over the 8 CPU devices
    )
    tr.fit(_model(dm, 2), dm)
    assert np.isfinite(tr.best_val_loss)


@pytest.mark.parametrize("weird_batch", [24])
def test_device_mode_batch_not_divisible_by_shards(weird_batch):
    # batch 24 over 8 'data' shards divides; 24 over the default mesh works,
    # and N=100 leaves a 4-row partial batch on top.
    dm = _dm(num_samples=100, batch_size=weird_batch)
    tr = Trainer(
        max_epochs=2, run_dir=tempfile.mkdtemp(), seed=0, epochs_per_call=2,
        save_resume_state=False,
    )
    tr.fit(_model(dm, 2), dm)
    assert np.isfinite(tr.best_val_loss)
