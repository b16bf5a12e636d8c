"""End-to-end raw-file fixtures for the real datamodules.

Each test writes a tiny file with the REAL dataset's schema (column names,
layouts, units — reference dataloaders/datamodules.py:187-229, 406-410,
469-476, 530-537 and utils/preprocessing.py) and drives
``prepare_data → setup → dataset_parameters → train_dataloader`` through it,
so a schema drift against the upstream files is caught by the suite."""

import tempfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from fdtpu.data import (
    ECGDatamodule,
    MIMICIIIDatamodule,
    NASADatamodule,
    NASDAQDatamodule,
    USDroughtsDatamodule,
)


def _drive(dm):
    dm.prepare_data()
    dm.setup("fit")
    params = dm.dataset_parameters
    batch = next(iter(dm.train_dataloader()))
    assert batch.shape[1:] == (params["max_len"], params["n_channels"])
    assert np.isfinite(batch).all()
    return params


# ----------------------------------------------------------------- ECG
def test_ecg_raw_csv_fixture():
    """MIT-BIH CSVs: 188 columns (187 samples + class label), no header —
    reference reads with default header so the first row is consumed as
    header (preserved quirk)."""
    root = Path(tempfile.mkdtemp())
    d = root / "ecg"
    d.mkdir()
    rng = np.random.default_rng(0)
    for name, n in (("mitbih_train.csv", 30), ("mitbih_test.csv", 10)):
        vals = rng.uniform(0, 1, size=(n, 187)).astype(np.float32)
        labels = rng.integers(0, 5, size=(n, 1)).astype(np.float32)
        pd.DataFrame(np.hstack([vals, labels])).to_csv(
            d / name, index=False, header=False
        )
    dm = ECGDatamodule(data_dir=root, batch_size=4)
    params = _drive(dm)
    assert params["max_len"] == 187
    assert params["n_channels"] == 1
    # header quirk: one row consumed
    assert dm.X_train.shape == (29, 187, 1)


# ----------------------------------------------------------------- NASDAQ
def test_nasdaq_raw_stock_csvs_fixture():
    """Per-stock CSVs (Date/Open/High/Low/Close/Adj Close/Volume); only
    stocks spanning 2019 with exactly 252 trading days survive."""
    root = Path(tempfile.mkdtemp())
    d = root / "nasdaq"
    (d / "stocks").mkdir(parents=True)
    rng = np.random.default_rng(1)
    days_2019 = pd.bdate_range("2019-01-02", "2019-12-31")[:252]
    assert len(days_2019) == 252
    full_dates = (
        [pd.Timestamp("2018-12-28")] + list(days_2019) + [pd.Timestamp("2020-01-02")]
    )
    for name in ("AAAA", "BBBB", "CCCC"):
        df = pd.DataFrame(
            {
                "Date": full_dates,
                "Open": rng.uniform(10, 20, len(full_dates)),
                "High": rng.uniform(20, 30, len(full_dates)),
                "Low": rng.uniform(5, 10, len(full_dates)),
                "Close": rng.uniform(10, 20, len(full_dates)),
                "Adj Close": rng.uniform(10, 20, len(full_dates)),
                "Volume": rng.integers(1000, 2000, len(full_dates)),
            }
        )
        df.to_csv(d / "stocks" / f"{name}.csv", index=False)
    # One stock with a hole (251 days in 2019) must be filtered out.
    df_bad = df.iloc[:-2]
    df_bad.to_csv(d / "stocks" / "HOLE.csv", index=False)

    dm = NASDAQDatamodule(data_dir=root, batch_size=2)
    params = _drive(dm)
    assert params["max_len"] == 252
    assert params["n_channels"] == 5  # volume dropped
    assert dm.X_train.shape[0] + dm.X_test.shape[0] == 3


# ----------------------------------------------------------------- NASA
def test_nasa_raw_battery_fixture():
    """cleaned_dataset/metadata.csv + per-cycle data CSVs; charge subset is
    binned to (N, 501, 5) then strided/outlier-dropped to (N, 251, 4)."""
    root = Path(tempfile.mkdtemp())
    d = root / "nasa"
    (d / "cleaned_dataset" / "data").mkdir(parents=True)
    rng = np.random.default_rng(2)
    files = [f"{i:05d}.csv" for i in range(3)]
    meta = pd.DataFrame(
        {
            "type": ["charge"] * 3 + ["discharge"],
            "filename": files + ["99999.csv"],
            "battery_id": ["B05"] * 4,
        }
    )
    meta.to_csv(d / "cleaned_dataset" / "metadata.csv", index=False)
    t = np.arange(0, 5100, 5.0)  # max diff 5 <= bin 10, spans past cutoff
    for f in files:
        pd.DataFrame(
            {
                "Voltage_measured": rng.uniform(3, 4, len(t)),
                "Current_measured": rng.uniform(-1, 2, len(t)),
                "Temperature_measured": rng.uniform(20, 40, len(t)),
                "Current_charge": rng.uniform(0, 2, len(t)),
                "Voltage_charge": rng.uniform(4, 5, len(t)),
                "Time": t,
            }
        ).to_csv(d / "cleaned_dataset" / "data" / f, index=False)
    # the discharge file is never read for the charge subset
    dm = NASADatamodule(data_dir=root, batch_size=2, subdataset="charge")
    params = _drive(dm)
    assert params["max_len"] == 251
    assert params["n_channels"] == 4


# ----------------------------------------------------------------- droughts
def test_droughts_raw_timeseries_fixture():
    """train_timeseries.csv: daily county meteorology; NaN-bearing columns
    (weekly drought score) are dropped, then T2M-correlated features
    {4,5,6,7,9} are removed."""
    root = Path(tempfile.mkdtemp())
    d = root / "droughts"
    (d / "train_timeseries").mkdir(parents=True)
    rng = np.random.default_rng(3)
    dates = pd.date_range("2010-12-25", "2012-01-10", freq="D")
    feats = [
        "PRECTOT", "PS", "QV2M", "T2M", "T2MDEW", "T2MWET", "T2M_MAX",
        "T2M_MIN", "T2M_RANGE", "TS", "WS10M", "WS50M",
    ]
    rows = []
    for fips in (1001, 1003):
        for date in dates:
            row = {"fips": fips, "date": date}
            row.update({f: rng.uniform(0, 10) for f in feats})
            # weekly score: NaN except Tuesdays (forces dropna(axis=1))
            row["score"] = rng.uniform(0, 5) if date.dayofweek == 1 else np.nan
            rows.append(row)
    pd.DataFrame(rows).to_csv(
        d / "train_timeseries" / "train_timeseries.csv", index=False
    )
    dm = USDroughtsDatamodule(data_dir=root, batch_size=1)
    params = _drive(dm)
    assert params["max_len"] == 365
    assert params["n_channels"] == len(feats) - 5  # {4,5,6,7,9} dropped


# ----------------------------------------------------------------- MIMIC-III
def _mimic_frames(n_features=104, n_subjects=6, hours=30):
    rng = np.random.default_rng(4)
    sub = np.arange(n_subjects)
    statics = pd.DataFrame(
        {
            "max_hours": [hours + 10] * n_subjects,
            "mort_hosp": rng.integers(0, 2, n_subjects),
            "mort_icu": rng.integers(0, 2, n_subjects),
            "los_icu": rng.uniform(1, 5, n_subjects),
        },
        index=pd.MultiIndex.from_arrays(
            [sub, sub + 100, sub + 200],
            names=["subject_id", "hadm_id", "icustay_id"],
        ),
    )
    idx = pd.MultiIndex.from_product(
        [sub, sub + 100, sub + 200, range(hours)],
        names=["subject_id", "hadm_id", "icustay_id", "hours_in"],
    )
    # keep only matching (s, s+100, s+200) rows like the real layout
    idx = pd.MultiIndex.from_tuples(
        [
            (s, h, i, t)
            for s, h, i, t in idx
            if h == s + 100 and i == s + 200
        ],
        names=["subject_id", "hadm_id", "icustay_id", "hours_in"],
    )
    cols = pd.MultiIndex.from_product(
        [[f"feat{i}" for i in range(n_features)], ["mean", "count"]],
        names=["LEVEL2", "Aggregation Function"],
    )
    vals = rng.uniform(0, 1, size=(len(idx), len(cols)))
    df = pd.DataFrame(vals, index=idx, columns=cols)
    # sprinkle missingness: zero counts + NaN means
    mask = rng.uniform(size=(len(idx), n_features)) < 0.3
    means = df.loc[:, pd.IndexSlice[:, "mean"]].values.copy()
    means[mask] = np.nan
    df.loc[:, pd.IndexSlice[:, "mean"]] = means
    counts = df.loc[:, pd.IndexSlice[:, "count"]].values.copy()
    counts[mask] = 0.0
    df.loc[:, pd.IndexSlice[:, "count"]] = counts
    return statics, df


def test_mimic_frames_pipeline_fixture():
    """Frame-level MIMIC pipeline on a schema-accurate fixture (the h5 read
    itself needs pytables — covered by the skip-gated test below)."""
    from fdtpu.data.preprocessing import mimic_preprocess_frames

    d = Path(tempfile.mkdtemp())
    statics, df = _mimic_frames(n_features=12)
    mimic_preprocess_frames(
        statics, df, d, random_seed=0, expected_features=12
    )
    x_train = np.load(d / "X_train.npy")
    x_test = np.load(d / "X_test.npy")
    assert x_train.shape[1:] == (24, 12)
    assert x_test.shape[1:] == (24, 12)
    assert np.isfinite(x_train).all() and np.isfinite(x_test).all()

    root = d / "mroot"
    (root / "mimiciii").mkdir(parents=True)
    import shutil
    for f in ("X_train.npy", "X_test.npy"):
        shutil.copy(d / f, root / "mimiciii" / f)
    dm = MIMICIIIDatamodule(data_dir=root, batch_size=2, n_feats=5)
    dm.setup("fit")
    assert dm.dataset_parameters["n_channels"] == 5
    assert dm.dataset_parameters["max_len"] == 24


def test_mimic_h5_roundtrip_fixture():
    """Full h5 path (pd.read_hdf) — runs where pytables is installed."""
    pytest.importorskip("tables")
    d = Path(tempfile.mkdtemp())
    statics, df = _mimic_frames(n_features=12)
    statics.to_hdf(d / "all_hourly_data.h5", key="patients")
    df.to_hdf(d / "all_hourly_data.h5", key="vitals_labs")
    from fdtpu.data.preprocessing import mimic_preprocess

    with pytest.raises(AssertionError):
        # 12-feature fixture vs the hard (24, 104) shape assert: the h5 read
        # and pipeline run; only the final shape gate trips.
        mimic_preprocess(d, random_seed=0)
