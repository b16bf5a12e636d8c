"""Raw-data preprocessing pipelines (pandas/numpy, torch-free).

Functional reimplementation of
`/root/reference/src/fdiff/utils/preprocessing.py:10-395`: same filters,
binning, pivots and output shapes; tensors are saved as ``.npy`` (with
read-compat for pre-existing ``.pt`` files via torch-cpu when available).
Train/test splits use a seeded numpy permutation (the reference seeds
torch's RNG — statistically equivalent, not bit-identical).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pandas as pd


def save_split(data_dir: Path, X: np.ndarray, train_frac: float, seed: int) -> None:
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(X))
    n_train = int(train_frac * len(X))
    data_dir.mkdir(parents=True, exist_ok=True)
    np.save(data_dir / "X_train.npy", X[perm[:n_train]].astype(np.float32))
    np.save(data_dir / "X_test.npy", X[perm[n_train:]].astype(np.float32))


def load_tensor(path_base: Path) -> np.ndarray:
    """Load ``<base>.npy``, falling back to a pre-existing torch ``<base>.pt``."""
    npy = path_base.with_suffix(".npy")
    if npy.exists():
        return np.load(npy)
    pt = path_base.with_suffix(".pt")
    if pt.exists():
        import torch

        return torch.load(pt, map_location="cpu", weights_only=False).numpy()
    raise FileNotFoundError(f"Neither {npy} nor {pt} exists")


# ----------------------------------------------------------------- MIMIC-III
def mimic_imputer(df: pd.DataFrame) -> pd.DataFrame:
    """MIMIC-Extract-style imputation (reference preprocessing.py:10-70):
    ffill per stay → per-stay mean → 0; adds mask and time-since-measured
    channels."""
    id_cols = ["subject_id", "hadm_id", "icustay_id"]
    idx = pd.IndexSlice
    df = df.copy()
    if len(df.columns.names) > 2:
        df.columns = df.columns.droplevel(("label", "LEVEL1", "LEVEL2"))

    df_out = df.loc[:, idx[:, ["mean", "count"]]]
    means = df_out.loc[:, idx[:, "mean"]]
    # ffill per stay → per-stay mean → 0 (reference preprocessing.py:39-46;
    # GroupBy.fillna was removed in pandas 2, so the stay-mean fill uses
    # transform("mean") instead).
    stay_means = means.groupby(id_cols).transform("mean")
    df_out.loc[:, idx[:, "mean"]] = (
        means.groupby(id_cols).ffill().fillna(stay_means).fillna(0)
    )

    df_out.loc[:, idx[:, "count"]] = (df.loc[:, idx[:, "count"]] > 0).astype(float)
    df_out.rename(
        columns={"count": "mask"}, level="Aggregation Function", inplace=True
    )

    is_absent = 1 - df_out.loc[:, idx[:, "mask"]]
    hours_of_absence = is_absent.cumsum()
    time_since_measured = hours_of_absence - hours_of_absence[is_absent == 0].ffill()
    time_since_measured.rename(
        columns={"mask": "time_since_measured"},
        level="Aggregation Function",
        inplace=True,
    )
    df_out = pd.concat((df_out, time_since_measured), axis=1)
    df_out.loc[:, idx[:, "time_since_measured"]] = df_out.loc[
        :, idx[:, "time_since_measured"]
    ].fillna(100)
    df_out.sort_index(axis=1, inplace=True)
    return df_out


def _mimic_to_3d(df: pd.DataFrame) -> np.ndarray:
    idx = pd.IndexSlice
    hours = sorted(set(df.index.get_level_values("hours_in")))
    return np.dstack([df.loc[idx[:, :, :, h], :].values for h in hours])


def _read_hdf_frame(path: Path, key: str) -> pd.DataFrame:
    """``pd.read_hdf`` with an h5py fallback: pandas needs the optional
    ``pytables`` dependency; where it is missing, fixed-format frames (what
    MIMIC-Extract writes) are parsed directly via h5py
    (:mod:`fdtpu.data.hdf_fixed`)."""
    try:
        return pd.read_hdf(path, key)
    except ImportError:
        from fdtpu.data.hdf_fixed import read_fixed_frame

        return read_fixed_frame(path, key)


def mimic_preprocess(data_dir: Path, random_seed: int, train_frac: float = 0.8) -> None:
    """First-24h vitals/labs → (N, 24, 104) tensors (reference :83-180).

    Reads the MIMIC-Extract ``all_hourly_data.h5`` (pytables where
    available, h5py fallback otherwise); the frame-level pipeline lives in
    :func:`mimic_preprocess_frames` so it can be exercised on
    schema-accurate fixtures without any h5 reader."""
    dataset_path = data_dir / "all_hourly_data.h5"
    statics = _read_hdf_frame(dataset_path, "patients")
    df = _read_hdf_frame(dataset_path, "vitals_labs")
    mimic_preprocess_frames(statics, df, data_dir, random_seed, train_frac)


def mimic_preprocess_frames(
    statics: pd.DataFrame,
    df: pd.DataFrame,
    data_dir: Path,
    random_seed: int,
    train_frac: float = 0.8,
    expected_features: int = 104,
) -> None:
    """MIMIC pipeline on already-loaded frames (reference :83-180):
    cohort filter → subject split → train-stat standardize → impute →
    (N, 24, C) tensors."""
    gap_time, window_size = 6, 24

    ys = statics[statics.max_hours > window_size + gap_time][
        ["mort_hosp", "mort_icu", "los_icu"]
    ]
    lvl2 = df[
        df.index.get_level_values("icustay_id").isin(
            set(ys.index.get_level_values("icustay_id"))
        )
        & (df.index.get_level_values("hours_in") < window_size)
    ]

    subjects = np.array(sorted(set(lvl2.index.get_level_values("subject_id"))))
    rng = np.random.default_rng(random_seed)
    subjects = rng.permutation(subjects)
    n_train = int(train_frac * len(subjects))
    splits = {"train": set(subjects[:n_train]), "test": set(subjects[n_train:])}

    idx = pd.IndexSlice
    lvl2_train = lvl2[lvl2.index.get_level_values("subject_id").isin(splits["train"])]
    lvl2_test = lvl2[lvl2.index.get_level_values("subject_id").isin(splits["test"])]

    means = lvl2_train.loc[:, idx[:, "mean"]].mean(axis=0)
    stds = lvl2_train.loc[:, idx[:, "mean"]].std(axis=0)
    lvl2_train = lvl2_train.copy()
    lvl2_test = lvl2_test.copy()
    lvl2_train.loc[:, idx[:, "mean"]] = (
        lvl2_train.loc[:, idx[:, "mean"]] - means
    ) / stds
    lvl2_test.loc[:, idx[:, "mean"]] = (lvl2_test.loc[:, idx[:, "mean"]] - means) / stds

    lvl2_train, lvl2_test = mimic_imputer(lvl2_train), mimic_imputer(lvl2_test)
    for d in (lvl2_train, lvl2_test):
        assert not d.isnull().any().any()

    for d, name in ((lvl2_train, "train"), (lvl2_test, "test")):
        x = _mimic_to_3d(d.loc[:, pd.IndexSlice[:, "mean"]]).astype(np.float32)
        x = np.transpose(x, (0, 2, 1))  # (N, time, channel)
        assert x.shape[1:] == (24, expected_features), x.shape
        np.save(data_dir / f"X_{name}.npy", x)


# ----------------------------------------------------------------- NASDAQ
def nasdaq_preprocess(
    data_dir: Path,
    random_seed: int,
    train_frac: float = 0.9,
    start_date: str = "2019-01-01",
    end_date: str = "2020-01-01",
) -> None:
    """Full-year-2019 stocks → (N, 252, 6) tensors (reference :183-258)."""
    df_list = []
    stock_paths = sorted((data_dir / "stocks").glob("*.csv"))
    for path in stock_paths:
        df_stock = pd.read_csv(path)
        df_stock["Name"] = path.stem
        df_list.append(df_stock)
    df = pd.concat(df_list, axis=0, ignore_index=True)
    df["Date"] = pd.to_datetime(df["Date"])

    start_time, end_time = pd.to_datetime(start_date), pd.to_datetime(end_date)
    first = df.groupby("Name")["Date"].min()
    last = df.groupby("Name")["Date"].max()
    valid = set(first[first <= start_time].index) & set(last[last >= end_time].index)
    df = df[df["Name"].isin(valid) & (df["Date"] >= start_time) & (df["Date"] < end_time)]

    counts = df.groupby("Name")["Date"].nunique()
    df = df[df["Name"].isin(set(counts[counts == 252].index))]

    df_pivot = df.pivot_table(
        index="Name",
        columns="Date",
        values=["Open", "High", "Low", "Close", "Adj Close", "Volume"],
    )
    x = df_pivot.values.astype(np.float32)
    x = x.reshape(x.shape[0], -1, 252).transpose(0, 2, 1)  # (stock, day, feature)
    save_split(data_dir, x, train_frac, random_seed)


# ----------------------------------------------------------------- NASA battery
def nasa_preprocess(
    data_dir: Path,
    subdataset: str = "charge",
    train_frac: float = 0.9,
    random_seed: int = 42,
) -> None:
    """Battery charge/discharge cycles, time-binned (reference :261-350)."""
    if subdataset == "charge":
        features = [
            "Voltage_measured",
            "Current_measured",
            "Temperature_measured",
            "Current_charge",
            "Voltage_charge",
        ]
        interval_bin, cutoff_time = 10, 5000 - 5000 % 10
    elif subdataset == "discharge":
        features = [
            "Voltage_measured",
            "Current_measured",
            "Temperature_measured",
            "Current_load",
            "Voltage_load",
        ]
        interval_bin, cutoff_time = 15, 2000 - 2000 % 15
    else:
        raise ValueError(f"Unknown subdataset {subdataset}")

    metadata = pd.read_csv(data_dir / "cleaned_dataset" / "metadata.csv")
    files = metadata[metadata["type"] == subdataset]["filename"].values

    frames = []
    for filename in files:
        data = pd.read_csv(data_dir / "cleaned_dataset" / "data" / filename)
        if data["Time"].max() <= cutoff_time:
            continue
        if data["Time"].diff().max() > interval_bin:
            continue
        data = data[data["Time"] < cutoff_time]
        data["Time_Bin"] = pd.cut(
            data["Time"],
            bins=range(-interval_bin, int(cutoff_time + interval_bin), interval_bin),
        )
        result = data.groupby("Time_Bin", observed=False).mean().reset_index()
        result["Time_Bin"] = result.index
        result["filename"] = filename
        frames.append(result)

    full_df = pd.concat(frames)
    df_pivot = full_df.pivot(index="filename", columns="Time_Bin", values=features)
    num_timesteps = cutoff_time // interval_bin + 1
    x = df_pivot.values.astype(np.float32)
    x = x.reshape(x.shape[0], -1, num_timesteps).transpose(0, 2, 1)
    save_split(data_dir / subdataset, x, train_frac, random_seed)


# ----------------------------------------------------------------- US droughts
def droughts_preprocess(
    data_dir: Path,
    random_seed: int,
    train_frac: float = 0.9,
    start_date: str = "2011-01-01",
    end_date: str = "2012-01-01",
) -> None:
    """One year of daily county meteorology → (N, 365, F) (reference :353-395)."""
    df = pd.read_csv(data_dir / "train_timeseries" / "train_timeseries.csv")
    df["date"] = pd.to_datetime(df["date"])
    start_time, end_time = pd.to_datetime(start_date), pd.to_datetime(end_date)
    df = df[(df["date"] >= start_time) & (df["date"] < end_time)]
    df = df.dropna(axis=1)

    df_pivot = df.pivot_table(index="fips", columns="date")
    num_days = (end_time - start_time).days
    x = df_pivot.values.astype(np.float32)
    x = x.reshape(x.shape[0], -1, num_days).transpose(0, 2, 1)
    save_split(data_dir, x, train_frac, random_seed)


def log_preprocessing(name: str, data_dir: Path) -> None:
    logging.info(
        "Preprocessed tensors for %s not found in %s; running the pipeline.",
        name,
        data_dir,
    )
