"""Datamodules for the six supported datasets.

Redesign of `/root/reference/src/fdiff/dataloaders/datamodules.py:68-550`:
the LightningDataModule becomes a plain class with the same lifecycle
(``prepare_data`` → ``setup`` → loaders) and identical dataset filters.
Downloads use the Kaggle API when installed (same dataset slugs); otherwise
an informative error explains how to place the raw files manually — this
environment has no network egress.
"""

from __future__ import annotations

import logging
import os
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
import pandas as pd

from fdtpu.data.dataset import DiffusionDataset, NumpyLoader
from fdtpu.data.preprocessing import (
    droughts_preprocess,
    load_tensor,
    mimic_preprocess,
    nasa_preprocess,
    nasdaq_preprocess,
)
from fdtpu.ops import localization_metrics, smooth_frequency


class Datamodule(ABC):
    """Base datamodule (reference datamodules.py:68-161)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
    ) -> None:
        if isinstance(data_dir, str):
            data_dir = Path(data_dir)
        self.data_dir = data_dir / self.dataset_name
        self.random_seed = random_seed
        self.batch_size = batch_size
        self.fourier_transform = fourier_transform
        self.standardize = standardize
        self.X_train: np.ndarray = np.zeros((0, 0, 0), np.float32)
        self.y_train: Optional[np.ndarray] = None
        self.X_test: np.ndarray = np.zeros((0, 0, 0), np.float32)
        self.y_test: Optional[np.ndarray] = None
        # Split -> (keyed arrays, DiffusionDataset).  Dataset construction
        # runs the full-split DFT (an on-device matmul through the TPU
        # relay); memoizing it keeps per-epoch dataloader calls host-only.
        self._ds_cache: dict[str, tuple[tuple, DiffusionDataset]] = {}

    def _cached_dataset(self, split: str, builder, *arrays) -> DiffusionDataset:
        # Identity-compare against the STORED arrays: keeping the references
        # in the cache pins them alive, so a freed array's id can never be
        # reused by a new allocation and serve a stale dataset.  (In-place
        # mutation of a keyed array still requires re-running setup().)
        hit = self._ds_cache.get(split)
        if hit is None or len(hit[0]) != len(arrays) or any(
            a is not b for a, b in zip(hit[0], arrays)
        ):
            self._ds_cache[split] = (tuple(arrays), builder())
        return self._ds_cache[split][1]

    def prepare_data(self) -> None:
        if not self.data_dir.exists():
            logging.info(
                "Downloading %s dataset into %s.", self.dataset_name, self.data_dir
            )
            os.makedirs(self.data_dir)
            self.download_data()

    @abstractmethod
    def download_data(self) -> None: ...

    @abstractmethod
    def setup(self, stage: str = "fit") -> None: ...

    @property
    @abstractmethod
    def dataset_name(self) -> str: ...

    def _kaggle_download(self, slug: str) -> None:
        try:
            import kaggle
        except ImportError as exc:
            raise RuntimeError(
                f"Dataset {self.dataset_name} is missing from {self.data_dir} and the "
                f"kaggle package is unavailable (no network egress here). Download "
                f"https://www.kaggle.com/datasets/{slug} manually and unzip it into "
                f"{self.data_dir}."
            ) from exc
        kaggle.api.authenticate()
        kaggle.api.dataset_download_files(slug, path=self.data_dir, unzip=True)

    def _train_set(self) -> DiffusionDataset:
        return self._cached_dataset(
            "train",
            lambda: DiffusionDataset(
                X=self.X_train,
                y=self.y_train,
                fourier_transform=self.fourier_transform,
                standardize=self.standardize,
            ),
            self.X_train,
        )

    def train_dataloader(self) -> NumpyLoader:
        return NumpyLoader(
            self._train_set(), self.batch_size, shuffle=True, seed=self.random_seed
        )

    def test_dataloader(self) -> NumpyLoader:
        test_set = self._cached_dataset(
            "test",
            lambda: DiffusionDataset(
                X=self.X_test, y=self.y_test,
                fourier_transform=self.fourier_transform,
            ),
            self.X_test,
        )
        return NumpyLoader(test_set, self.batch_size, shuffle=False)

    def val_dataloader(self) -> NumpyLoader:
        # Val standardizes with train-set stats (reference datamodules.py:127-140).
        val_set = self._cached_dataset(
            "val",
            lambda: DiffusionDataset(
                X=self.X_test,
                y=self.y_test,
                fourier_transform=self.fourier_transform,
                standardize=self.standardize,
                X_ref=self.X_train,
            ),
            self.X_test,
            self.X_train,
        )
        return NumpyLoader(val_set, self.batch_size, shuffle=False)

    @property
    def dataset_parameters(self) -> dict[str, Any]:
        return {
            "n_channels": int(self.X_train.shape[2]),
            "max_len": int(self.X_train.shape[1]),
            "num_training_steps": len(self.train_dataloader()),
        }

    @property
    def feature_mean_and_std(self) -> tuple[np.ndarray, np.ndarray]:
        train_set = DiffusionDataset(
            X=self.X_train,
            y=self.y_train,
            fourier_transform=self.fourier_transform,
            standardize=self.standardize,
        )
        return train_set.feature_mean, train_set.feature_std


class ECGDatamodule(Datamodule):
    """MIT-BIH heartbeat CSVs: 187 steps × 1 channel (reference :164-241)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        subsample_localization: bool = False,
        smooth_frequency: bool = False,
        smoother_width: float = 0.0,
    ) -> None:
        super().__init__(
            data_dir=data_dir,
            random_seed=random_seed,
            batch_size=batch_size,
            fourier_transform=fourier_transform,
            standardize=standardize,
        )
        self.subsample_localization = subsample_localization
        self.smooth_frequency = smooth_frequency
        self.smoother_width = smoother_width

    def setup(self, stage: str = "fit") -> None:
        df_train = pd.read_csv(self.data_dir / "mitbih_train.csv")
        df_test = pd.read_csv(self.data_dir / "mitbih_test.csv")
        self.X_train = df_train.iloc[:, :187].values.astype(np.float32)[:, :, None]
        self.y_train = df_train.iloc[:, 187].values.astype(np.int64)
        self.X_test = df_test.iloc[:, :187].values.astype(np.float32)[:, :, None]
        self.y_test = df_test.iloc[:, 187].values.astype(np.int64)

        if self.subsample_localization:
            # Keep the 1000 most time-localized series (reference :206-218).
            x_loc, x_spec_loc = localization_metrics(jnp.asarray(self.X_train))
            loc_score = np.asarray(x_loc) / np.asarray(x_spec_loc)
            ranking = np.argsort(loc_score)
            self.X_train = self.X_train[ranking[:1000]]
            self.y_train = self.y_train[ranking[:1000]]
            logging.info("Subsampled the training set by localization score.")

        if self.smooth_frequency and self.smoother_width > 0.0:
            self.X_train = np.asarray(
                smooth_frequency(jnp.asarray(self.X_train), self.smoother_width)
            )
            self.X_test = np.asarray(
                smooth_frequency(jnp.asarray(self.X_test), self.smoother_width)
            )
            logging.info("Smoothed the frequency domain of the data.")

    def download_data(self) -> None:
        self._kaggle_download("shayanfazeli/heartbeat")

    @property
    def dataset_name(self) -> str:
        return "ecg"


class SyntheticDatamodule(Datamodule):
    """sin(t·f + φ), f~Beta(2,2), φ~N(0,1) — the Fourier-flows DGP
    (reference :244-304).  Generates locally; ideal for CI.

    ``n_channels`` extends the DGP beyond the reference (which is strictly
    univariate): each channel draws its own frequency/phase, so the series
    are multivariate with independent spectral content.  At the default
    ``n_channels=1`` the generated values, CSV layout and loaded arrays are
    bit-identical to before — the multivariate path stores ``.npy`` instead
    (a (N, T, C) array does not fit the reference's 2-D CSV layout).  Used
    by ``scripts/bench_shape_scaling.py`` to reproduce the five reference
    dataset *shapes* (paper Table 1) without Kaggle egress.
    """

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        max_len: int = 100,
        num_samples: int = 1000,
        n_channels: int = 1,
    ) -> None:
        self.n_channels = n_channels
        super().__init__(
            data_dir=data_dir,
            random_seed=random_seed,
            batch_size=batch_size,
            fourier_transform=fourier_transform,
            standardize=standardize,
        )
        self.max_len = max_len
        self.num_samples = num_samples

    def setup(self, stage: str = "fit") -> None:
        if self.n_channels == 1:
            df_train = pd.read_csv(self.data_dir / "train.csv", header=None)
            df_test = pd.read_csv(self.data_dir / "test.csv", header=None)
            self.X_train = df_train.values.astype(np.float32)[:, :, None]
            self.X_test = df_test.values.astype(np.float32)[:, :, None]
        else:
            self.X_train = np.load(self.data_dir / "train.npy")
            self.X_test = np.load(self.data_dir / "test.npy")
        self.y_train = None
        self.y_test = None

    def _generation_params(self) -> dict[str, int]:
        return {
            "max_len": self.max_len,
            "num_samples": self.num_samples,
            "n_channels": self.n_channels,
            "random_seed": self.random_seed,
        }

    def prepare_data(self) -> None:
        """Generate — or REgenerate when the cached files were produced with
        different parameters.  Unlike the download datamodules (where
        dir-exists ⇒ data is the data), synthetic data is a function of
        (max_len, num_samples, n_channels, seed): silently serving a stale
        cache trained a '187-token' model on 100-token series once.  A
        ``synthetic_meta.json`` sidecar records the generation parameters;
        mismatch or absence regenerates (cheap, seeded, deterministic)."""
        import json

        meta_path = self.data_dir / "synthetic_meta.json"
        params = self._generation_params()
        if self.data_dir.exists():
            try:
                if json.loads(meta_path.read_text()) == params:
                    return
            except (OSError, ValueError):
                pass
            logging.info(
                "Cached synthetic data in %s does not match the requested "
                "parameters %s; regenerating.", self.data_dir, params,
            )
        else:
            os.makedirs(self.data_dir)
        self.download_data()
        meta_path.write_text(json.dumps(params))

    def download_data(self) -> None:
        rng = np.random.default_rng(self.random_seed)
        n_generated = 2 * self.num_samples
        if self.n_channels == 1:
            phase = rng.normal(size=(n_generated, 1))
            frequency = rng.beta(a=2, b=2, size=(n_generated, 1))
            timesteps = np.arange(self.max_len)
            x = np.sin(timesteps * frequency + phase)
            pd.DataFrame(x[: self.num_samples]).to_csv(
                self.data_dir / "train.csv", index=False, header=False
            )
            pd.DataFrame(x[self.num_samples :]).to_csv(
                self.data_dir / "test.csv", index=False, header=False
            )
        else:
            phase = rng.normal(size=(n_generated, 1, self.n_channels))
            frequency = rng.beta(a=2, b=2, size=(n_generated, 1, self.n_channels))
            timesteps = np.arange(self.max_len)[None, :, None]
            x = np.sin(timesteps * frequency + phase).astype(np.float32)
            np.save(self.data_dir / "train.npy", x[: self.num_samples])
            np.save(self.data_dir / "test.npy", x[self.num_samples :])

    @property
    def dataset_name(self) -> str:
        return "synthetic" if self.n_channels == 1 else f"synthetic_c{self.n_channels}"


class MIMICIIIDatamodule(Datamodule):
    """Restricted MIMIC-III; keeps the top-variance features (reference :307-366)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        n_feats: int = 40,
    ) -> None:
        super().__init__(
            data_dir=data_dir,
            random_seed=random_seed,
            batch_size=batch_size,
            fourier_transform=fourier_transform,
            standardize=standardize,
        )
        self.n_feats = n_feats

    def setup(self, stage: str = "fit") -> None:
        if not (
            (self.data_dir / "X_train.npy").exists()
            or (self.data_dir / "X_train.pt").exists()
        ):
            mimic_preprocess(data_dir=self.data_dir, random_seed=self.random_seed)
        self.X_train = load_tensor(self.data_dir / "X_train")
        self.X_test = load_tensor(self.data_dir / "X_test")

        # Keep features with the highest population variance (reference :349-353).
        top = np.argsort(self.X_train.std(axis=0).mean(axis=0))[::-1][: self.n_feats]
        self.X_train = self.X_train[:, :, top]
        self.X_test = self.X_test[:, :, top]

    def download_data(self) -> None:
        dataset_path = self.data_dir / "all_hourly_data.h5"
        assert dataset_path.exists(), (
            f"Dataset {dataset_path} does not exist. MIMIC-III is restricted; "
            "download the MIMIC-Extract preprocessed version yourself "
            "(https://github.com/MLforHealth/MIMIC_Extract)."
        )

    @property
    def dataset_name(self) -> str:
        return "mimiciii"


class NASDAQDatamodule(Datamodule):
    """2019 NASDAQ stocks (N, 252, 6) → drop volume → (N, 252, 5)
    (reference :369-422)."""

    def setup(self, stage: str = "fit") -> None:
        if not (
            (self.data_dir / "X_train.npy").exists()
            or (self.data_dir / "X_train.pt").exists()
        ):
            nasdaq_preprocess(data_dir=self.data_dir, random_seed=self.random_seed)
        self.X_train = load_tensor(self.data_dir / "X_train")
        self.X_test = load_tensor(self.data_dir / "X_test")
        assert self.X_train.shape[1:] == self.X_test.shape[1:] == (252, 6)
        self.X_train = self.X_train[:, :, :-1]
        self.X_test = self.X_test[:, :, :-1]

    def download_data(self) -> None:
        self._kaggle_download("jacksoncrow/stock-market-dataset")

    @property
    def dataset_name(self) -> str:
        return "nasdaq"


class NASADatamodule(Datamodule):
    """NASA battery charge/discharge (reference :425-490)."""

    def __init__(
        self,
        data_dir: Path | str = Path.cwd() / "data",
        random_seed: int = 42,
        batch_size: int = 32,
        fourier_transform: bool = False,
        standardize: bool = False,
        subdataset: str = "charge",
        remove_outlier_feature: bool = True,
    ) -> None:
        self.subdataset = subdataset
        self.remove_outlier_feature = remove_outlier_feature
        super().__init__(
            data_dir=data_dir,
            random_seed=random_seed,
            batch_size=batch_size,
            fourier_transform=fourier_transform,
            standardize=standardize,
        )

    def setup(self, stage: str = "fit") -> None:
        sub = self.data_dir / self.subdataset
        if not ((sub / "X_train.npy").exists() or (sub / "X_train.pt").exists()):
            nasa_preprocess(
                data_dir=self.data_dir,
                subdataset=self.subdataset,
                random_seed=self.random_seed,
            )
        self.X_train = load_tensor(sub / "X_train")
        self.X_test = load_tensor(sub / "X_test")

        if self.remove_outlier_feature and self.subdataset == "charge":
            # Drop the outlier-range feature and stride the time axis
            # (reference :469-476): (N, 501, 5) → (N, 251, 4).
            self.X_train = self.X_train[:, ::2][:, :, [0, 1, 3, 4]]
            self.X_test = self.X_test[:, ::2][:, :, [0, 1, 3, 4]]
            assert self.X_train.shape[1] == self.X_test.shape[1] == 251
            assert self.X_train.shape[2] == self.X_test.shape[2] == 4

    def download_data(self) -> None:
        self._kaggle_download("patrickfleith/nasa-battery-dataset")

    @property
    def dataset_name(self) -> str:
        return "nasa"


class USDroughtsDatamodule(Datamodule):
    """One year of daily county meteorology; drops T2M-correlated features
    (reference :493-550)."""

    def setup(self, stage: str = "fit") -> None:
        if not (
            (self.data_dir / "X_train.npy").exists()
            or (self.data_dir / "X_train.pt").exists()
        ):
            droughts_preprocess(data_dir=self.data_dir, random_seed=self.random_seed)
        self.X_train = load_tensor(self.data_dir / "X_train")
        self.X_test = load_tensor(self.data_dir / "X_test")

        feats = [i for i in range(self.X_train.shape[2]) if i not in {4, 5, 6, 7, 9}]
        self.X_train = self.X_train[:, :, feats]
        self.X_test = self.X_test[:, :, feats]
        assert self.X_train.shape[1] % 365 == self.X_test.shape[1] % 365 == 0

    def download_data(self) -> None:
        self._kaggle_download("cdminix/us-drought-meteorological-data")

    @property
    def dataset_name(self) -> str:
        return "droughts"


DATAMODULE_REGISTRY: dict[str, type[Datamodule]] = {
    "ecg": ECGDatamodule,
    "synthetic": SyntheticDatamodule,
    "mimiciii": MIMICIIIDatamodule,
    "nasdaq": NASDAQDatamodule,
    "nasa": NASADatamodule,
    "usdroughts": USDroughtsDatamodule,
}
