"""ECG datamodule on fixture CSVs (mitbih format: 187 values + label)."""

import numpy as np
import pandas as pd
import pytest

from fdtpu.data import ECGDatamodule


@pytest.fixture
def ecg_dir(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "ecg"
    d.mkdir()
    t = np.arange(187)
    for name, n in (("mitbih_train.csv", 64), ("mitbih_test.csv", 16)):
        # Heartbeat-ish bumps at random offsets + noise, plus a label column.
        X = np.stack(
            [np.exp(-0.5 * ((t - rng.randint(40, 140)) / 8.0) ** 2) for _ in range(n)]
        ) + 0.05 * rng.randn(n, 187)
        labels = rng.randint(0, 5, size=(n, 1))
        pd.DataFrame(np.hstack([X, labels])).to_csv(d / name, index=False)
    return tmp_path


def test_ecg_setup_shapes(ecg_dir):
    dm = ECGDatamodule(data_dir=ecg_dir, batch_size=16)
    dm.setup()
    assert dm.X_train.shape == (64, 187, 1)
    assert dm.X_test.shape == (16, 187, 1)
    assert dm.y_train.shape == (64,)
    params = dm.dataset_parameters
    assert params == {"n_channels": 1, "max_len": 187, "num_training_steps": 4}


def test_ecg_smoothing(ecg_dir):
    dm = ECGDatamodule(
        data_dir=ecg_dir, smooth_frequency=True, smoother_width=5.0
    )
    dm.setup()
    plain = ECGDatamodule(data_dir=ecg_dir)
    plain.setup()
    assert dm.X_train.shape == plain.X_train.shape
    assert np.abs(dm.X_train - plain.X_train).max() > 1e-3  # it did smooth
    # The packed spectrum becomes locally smoother: mean relative jump
    # between adjacent frequency components drops.
    import jax.numpy as jnp

    from fdtpu.ops import dft

    def roughness(x):
        s = np.asarray(dft(jnp.asarray(x)))
        return float(np.abs(np.diff(s, axis=1)).mean() / (np.abs(s).mean() + 1e-12))

    assert roughness(dm.X_train) < roughness(plain.X_train)


def test_ecg_subsample_localization(ecg_dir):
    dm = ECGDatamodule(data_dir=ecg_dir, subsample_localization=True)
    dm.setup()
    # Keeps min(1000, N) most time-localized series (fixture has 64).
    assert dm.X_train.shape[0] == 64
    assert dm.y_train.shape[0] == 64


def test_ecg_fourier_loader(ecg_dir):
    dm = ECGDatamodule(data_dir=ecg_dir, fourier_transform=True, standardize=True, batch_size=32)
    dm.setup()
    batch = next(iter(dm.train_dataloader()))
    assert batch.shape == (32, 187, 1)
    assert np.isfinite(batch).all()
