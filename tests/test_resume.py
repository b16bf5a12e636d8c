"""Mid-training resume: the restored run must reproduce the uninterrupted
loss trajectory exactly (params + opt_state + PRNG key snapshot)."""

import json
import tempfile

import jax
import numpy as np

from fdtpu.data import SyntheticDatamodule
from fdtpu.diffusion import VPScheduler
from fdtpu.models import ScoreModelConfig, init_score_model
from fdtpu.models.score_models import ScoreModel
from fdtpu.train import Trainer, get_training_params

CFG = ScoreModelConfig(
    n_channels=1, max_len=24, d_model=8, num_layers=2, n_head=4,
    dim_feedforward=16,
)


def _fresh_model(num_training_steps):
    sched = VPScheduler(fourier_noise_scaling=True).with_noise_scaling(24)
    model = ScoreModel(
        config=CFG,
        variables=init_score_model(jax.random.PRNGKey(0), CFG),
        scheduler=sched,
    )
    model.num_training_steps = num_training_steps
    return model


def _dm():
    dm = SyntheticDatamodule(
        data_dir=tempfile.mkdtemp(), max_len=24, num_samples=64, batch_size=16,
        fourier_transform=True, standardize=True,
    )
    dm.prepare_data()
    dm.setup()
    return dm


def _epoch_losses(metrics_path):
    out = {}
    for line in open(metrics_path).read().splitlines():
        rec = json.loads(line)
        if "train/loss_epoch" in rec:
            out[rec["epoch"]] = (rec["train/loss_epoch"], rec["val/loss"])
    return out


def test_kill_resume_reproduces_uninterrupted_trajectory():
    dm = _dm()
    steps = get_training_params(dm, max_epochs=4)["num_training_steps"]

    # Uninterrupted 4-epoch run.
    d_full = tempfile.mkdtemp()
    t_full = Trainer(max_epochs=4, run_dir=d_full, run_id="run", seed=0)
    t_full.fit(_fresh_model(steps), dm)
    full = _epoch_losses(t_full.metrics_path)

    # Interrupted: 2 epochs, then a NEW trainer process resumes to 4.
    d_part = tempfile.mkdtemp()
    t_a = Trainer(max_epochs=2, run_dir=d_part, run_id="run", seed=0)
    t_a.fit(_fresh_model(steps), dm)
    t_b = Trainer(
        max_epochs=4, run_dir=d_part, run_id="run", seed=0, resume=True
    )
    model_b = t_b.fit(_fresh_model(steps), dm)
    part = _epoch_losses(t_b.metrics_path)

    for epoch in range(4):
        np.testing.assert_allclose(
            part[epoch], full[epoch], rtol=1e-5, atol=1e-7,
            err_msg=f"epoch {epoch} diverged after resume",
        )
    assert t_b.best_val_loss <= t_a.best_val_loss
    assert np.isfinite(
        np.asarray(jax.tree.leaves(model_b.variables["params"])[0])
    ).all()


def test_resume_noop_without_snapshot():
    dm = _dm()
    steps = get_training_params(dm, max_epochs=1)["num_training_steps"]
    t = Trainer(
        max_epochs=1, run_dir=tempfile.mkdtemp(), seed=0, resume=True
    )
    t.fit(_fresh_model(steps), dm)  # no snapshot exists -> trains from scratch
    assert np.isfinite(t.best_val_loss)
