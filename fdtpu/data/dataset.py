"""Dataset + loader for diffusion training (numpy host pipeline).

Redesign of the reference ``DiffusionDataset`` + torch DataLoader
(`/root/reference/src/fdiff/dataloaders/datamodules.py:23-65, 102-140`).
The DFT transform and standardization happen once at construction on the
host (quirk Q7: the frequency transform lives outside the training graph);
batches are plain numpy arrays that the trainer shards onto the mesh.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

import jax

from fdtpu.ops import dft


def _host_dft(X: np.ndarray) -> np.ndarray:
    """Run the dataset-construction DFT on the host CPU backend.

    The frequency transform lives outside the training graph (quirk Q7), so
    dispatching it eagerly to the accelerator costs a chain of remote
    compiles (minutes through the TPU tunnel) for a one-time preprocessing
    step.  The CPU backend's real-FFT path is numerically equivalent to the
    packed matmul path (tests/test_dft_matmul.py) and runs in milliseconds.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return np.asarray(dft(jnp.asarray(X)))
    with jax.default_device(cpu):
        return np.asarray(dft(jnp.asarray(X), impl="fft"))


class DiffusionDataset:
    """Holds (optionally frequency-transformed, standardized) series.

    Args mirror the reference: ``X_ref`` supplies the standardization stats
    (the val set standardizes with train-set stats, datamodules.py:127-140).
    Standardization uses ddof=1 like torch ``Tensor.std``.
    """

    def __init__(
        self,
        X: np.ndarray,
        y: Optional[np.ndarray] = None,
        fourier_transform: bool = False,
        standardize: bool = False,
        X_ref: Optional[np.ndarray] = None,
    ) -> None:
        X = np.asarray(X, dtype=np.float32)
        if fourier_transform:
            X = _host_dft(X)
        self.X = X
        self.y = None if y is None else np.asarray(y)
        self.standardize = standardize
        if X_ref is None:
            X_ref = X
        else:
            X_ref = np.asarray(X_ref, dtype=np.float32)
            if fourier_transform:
                X_ref = _host_dft(X_ref)
        self.feature_mean = X_ref.mean(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            std = X_ref.std(axis=0, ddof=1)
        # Degenerate stats guard: a single-sample reference set (ddof=1 →
        # NaN) or a constant feature (std 0) must not poison standardization
        # with NaN/inf — fall back to unit scale for those features.  (The
        # reference inherits torch's NaN here and trains to NaN loss.)
        self.feature_std = np.where(np.isfinite(std) & (std > 0), std, 1.0)

    def __len__(self) -> int:
        return len(self.X)

    def standardized(self) -> np.ndarray:
        if not self.standardize:
            return self.X
        return (self.X - self.feature_mean) / self.feature_std

    def __getitem__(self, index: int) -> dict[str, np.ndarray]:
        data = {"X": self.X[index]}
        if self.standardize:
            data["X"] = (data["X"] - self.feature_mean) / self.feature_std
        if self.y is not None:
            data["y"] = self.y[index]
        return data


class NumpyLoader:
    """Seeded, shuffled mini-batch iterator over a :class:`DiffusionDataset`.

    Keeps the torch-DataLoader contract the trainer relies on:
    ``len(loader) = ceil(N / batch_size)`` (drop_last=False).
    """

    def __init__(
        self,
        dataset: DiffusionDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._data = dataset.standardized()

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)

    def skip_epochs(self, n: int) -> None:
        """Advance the shuffle RNG past ``n`` epochs without materializing
        batches (mid-training resume replays the exact batch sequence of an
        uninterrupted run; torch DataLoader analog: the sampler generator
        advancing one permutation per epoch)."""
        if self.shuffle:
            for _ in range(n):
                self._rng.permutation(len(self.dataset))

    def __iter__(self) -> Iterator[np.ndarray]:
        n = len(self.dataset)
        idx = self._rng.permutation(n) if self.shuffle else np.arange(n)
        for start in range(0, n, self.batch_size):
            yield self._data[idx[start : start + self.batch_size]]
