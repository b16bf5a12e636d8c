"""Datamodule tests (mirrors reference tests/test_datamodules.py)."""

import jax.numpy as jnp
import numpy as np

from fdtpu.data import DiffusionDataset, SyntheticDatamodule
from fdtpu.ops import idft


class DummyDatamodule(SyntheticDatamodule):
    """Seeded random data, no I/O (reference tests/test_datamodules.py:16-52)."""

    def __init__(self, fourier_transform=False, standardize=False, batch_size=32):
        super().__init__(
            fourier_transform=fourier_transform,
            standardize=standardize,
            batch_size=batch_size,
        )
        rng = np.random.default_rng(42)
        self.X_train = rng.normal(size=(320, 30, 3)).astype(np.float32)
        self.X_test = rng.normal(size=(64, 30, 3)).astype(np.float32)
        self.y_train = None
        self.y_test = None

    def prepare_data(self):
        pass

    def setup(self, stage="fit"):
        pass


def test_fourier_datamodule_roundtrip():
    """idft(freq dataset X) == time dataset X (reference :68-82)."""
    dm_time = DummyDatamodule(fourier_transform=False)
    dm_freq = DummyDatamodule(fourier_transform=True)
    ds_time = DiffusionDataset(X=dm_time.X_train, fourier_transform=False)
    ds_freq = DiffusionDataset(X=dm_freq.X_train, fourier_transform=True)
    np.testing.assert_allclose(
        np.asarray(idft(jnp.asarray(ds_freq.X))), ds_time.X, atol=1e-4
    )


def test_standardization_roundtrip_and_stats():
    """(x − μ)/σ·σ + μ == x; standardized train data has ~0 mean, ~1 std
    (reference :85-117)."""
    dm = DummyDatamodule(standardize=True)
    ds = DiffusionDataset(X=dm.X_train, standardize=True)
    std_data = ds.standardized()
    restored = std_data * ds.feature_std + ds.feature_mean
    np.testing.assert_allclose(restored, ds.X, atol=1e-5)
    np.testing.assert_allclose(std_data.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(std_data.std(axis=0, ddof=1), 1.0, atol=1e-4)


def test_val_uses_train_stats():
    dm = DummyDatamodule(standardize=True)
    val_set = DiffusionDataset(
        X=dm.X_test, standardize=True, X_ref=dm.X_train
    )
    train_set = DiffusionDataset(X=dm.X_train, standardize=True)
    np.testing.assert_allclose(val_set.feature_mean, train_set.feature_mean)
    np.testing.assert_allclose(val_set.feature_std, train_set.feature_std)


def test_dataset_parameters():
    dm = DummyDatamodule(batch_size=64)
    params = dm.dataset_parameters
    assert params["n_channels"] == 3
    assert params["max_len"] == 30
    assert params["num_training_steps"] == 5  # ceil(320 / 64)


def test_loader_batching_and_shuffling():
    dm = DummyDatamodule(batch_size=50)
    loader = dm.train_dataloader()
    batches = list(loader)
    assert len(batches) == 7  # ceil(320/50)
    assert batches[0].shape == (50, 30, 3)
    assert batches[-1].shape == (20, 30, 3)
    assert sum(b.shape[0] for b in batches) == 320
    # Shuffled: first batch differs from the raw head of the data.
    assert np.abs(batches[0] - dm.X_train[:50]).max() > 1e-6


def test_synthetic_datamodule_end_to_end(tmp_path):
    dm = SyntheticDatamodule(
        data_dir=tmp_path, max_len=24, num_samples=100, batch_size=16
    )
    dm.prepare_data()
    dm.setup()
    assert dm.X_train.shape == (100, 24, 1)
    assert dm.X_test.shape == (100, 24, 1)
    assert np.abs(dm.X_train).max() <= 1.0 + 1e-6  # sinusoids


def test_synthetic_datamodule_multichannel(tmp_path):
    """n_channels>1 extension: (N, T, C) sinusoids with per-channel
    frequency/phase, stored as .npy (used by scripts/bench_shape_scaling.py
    to reproduce the paper-Table-1 dataset shapes without Kaggle egress)."""
    dm = SyntheticDatamodule(
        data_dir=tmp_path, max_len=24, num_samples=50, batch_size=16,
        n_channels=5,
    )
    dm.prepare_data()
    dm.setup()
    assert dm.dataset_name == "synthetic_c5"
    assert dm.X_train.shape == (50, 24, 5)
    assert dm.X_test.shape == (50, 24, 5)
    assert dm.X_train.dtype == np.float32
    assert np.abs(dm.X_train).max() <= 1.0 + 1e-6
    # Channels carry independent spectral content (not copies).
    assert np.abs(dm.X_train[..., 0] - dm.X_train[..., 1]).max() > 0.1
    assert dm.dataset_parameters["n_channels"] == 5
    # Regeneration from the same seed is deterministic.
    dm2 = SyntheticDatamodule(
        data_dir=tmp_path, max_len=24, num_samples=50, batch_size=16,
        n_channels=5,
    )
    dm2.prepare_data()
    dm2.setup()
    np.testing.assert_array_equal(dm.X_train, dm2.X_train)


def test_loader_reshuffles_each_epoch():
    """One loader iterated twice yields different batch orders (torch
    DataLoader(shuffle=True) semantics) over the same sample multiset."""
    dm = DummyDatamodule(batch_size=50)
    loader = dm.train_dataloader()
    epoch0 = list(loader)
    epoch1 = list(loader)
    assert any(
        not np.array_equal(a, b) for a, b in zip(epoch0, epoch1)
    ), "second epoch repeated the first epoch's batch order"
    flat0 = np.sort(np.concatenate(epoch0, axis=0).ravel())
    flat1 = np.sort(np.concatenate(epoch1, axis=0).ravel())
    np.testing.assert_array_equal(flat0, flat1)


def test_loader_skip_epochs_replays_sequence():
    dm = DummyDatamodule(batch_size=50)
    loader = dm.train_dataloader()
    list(loader)  # epoch 0
    epoch1 = list(loader)
    fresh = dm.train_dataloader()
    fresh.skip_epochs(1)
    epoch1_replay = list(fresh)
    for a, b in zip(epoch1, epoch1_replay):
        np.testing.assert_array_equal(a, b)


def test_datamodule_memoizes_datasets():
    """Dataset construction (full-split DFT) must not repeat per epoch."""
    dm = DummyDatamodule(batch_size=50)
    assert dm.train_dataloader().dataset is dm.train_dataloader().dataset
    assert dm.val_dataloader().dataset is dm.val_dataloader().dataset
    assert dm.test_dataloader().dataset is dm.test_dataloader().dataset
    # Replacing the split invalidates the cache.
    ds_old = dm.train_dataloader().dataset
    dm.X_train = dm.X_train.copy()
    assert dm.train_dataloader().dataset is not ds_old


def test_synthetic_regenerates_on_parameter_change(tmp_path):
    """A cached synthetic dir generated with different parameters must be
    regenerated, not silently served (a stale 100-token cache once trained
    a '187-token' model on 100-token series)."""
    from fdtpu.data import SyntheticDatamodule

    dm = SyntheticDatamodule(data_dir=tmp_path, max_len=24, num_samples=8)
    dm.prepare_data()
    dm.setup()
    assert dm.X_train.shape == (8, 24, 1)

    dm2 = SyntheticDatamodule(data_dir=tmp_path, max_len=40, num_samples=6)
    dm2.prepare_data()
    dm2.setup()
    assert dm2.X_train.shape == (6, 40, 1)

    # Matching parameters reuse the cache (bit-identical reload).
    before = dm2.X_train.copy()
    dm3 = SyntheticDatamodule(data_dir=tmp_path, max_len=40, num_samples=6)
    dm3.prepare_data()
    dm3.setup()
    np.testing.assert_array_equal(dm3.X_train, before)
