"""Schema-accurate raw-file fixture writers for the real datamodules.

Each writer emits a tiny file tree with the REAL dataset's schema (column
names, layouts, units — reference dataloaders/datamodules.py:187-229,
406-410, 469-476, 530-537 and utils/preprocessing.py), so the full
prepare→preprocess→setup pipeline can be driven without Kaggle/PhysioNet
access.  Used by the test suite (tests/test_raw_fixtures.py) and by
``scripts/validate_real_data.py --fixture`` to prove the Table-2
reproduction harness end-to-end on boxes with no network egress.

The fixtures validate *plumbing and schema*, not statistics: metric
numbers obtained on them are meaningless — stage the real raw files to get
BASELINE.md Table-2 comparisons.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

__all__ = [
    "write_ecg_fixture",
    "write_nasdaq_fixture",
    "write_nasa_fixture",
    "write_droughts_fixture",
    "write_mimic_fixture",
    "mimic_fixture_frames",
]


def write_ecg_fixture(root: Path, n_train: int = 30, n_test: int = 10,
                      seed: int = 0) -> Path:
    """MIT-BIH CSVs: 188 columns (187 samples + class label), no header —
    the reference reads with a default header so the first row is consumed
    as header (preserved quirk)."""
    d = Path(root) / "ecg"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for name, n in (("mitbih_train.csv", n_train), ("mitbih_test.csv", n_test)):
        vals = rng.uniform(0, 1, size=(n, 187)).astype(np.float32)
        labels = rng.integers(0, 5, size=(n, 1)).astype(np.float32)
        pd.DataFrame(np.hstack([vals, labels])).to_csv(
            d / name, index=False, header=False
        )
    return d


def write_nasdaq_fixture(root: Path, n_stocks: int = 3, seed: int = 1,
                         with_holey_stock: bool = True) -> Path:
    """Per-stock CSVs (Date/Open/High/Low/Close/Adj Close/Volume); only
    stocks spanning 2019 with exactly 252 trading days survive the filter."""
    d = Path(root) / "nasdaq"
    (d / "stocks").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    days_2019 = pd.bdate_range("2019-01-02", "2019-12-31")[:252]
    assert len(days_2019) == 252
    full_dates = (
        [pd.Timestamp("2018-12-28")] + list(days_2019) + [pd.Timestamp("2020-01-02")]
    )
    df = None
    for i in range(n_stocks):
        name = "".join(chr(ord("A") + (i + j) % 26) for j in range(4))
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
    if with_holey_stock and df is not None:
        # One stock with a hole (251 days in 2019) must be filtered out.
        df.iloc[:-2].to_csv(d / "stocks" / "HOLE.csv", index=False)
    return d


def write_nasa_fixture(root: Path, n_files: int = 3, seed: int = 2,
                       kind: str = "charge") -> Path:
    """cleaned_dataset/metadata.csv + per-cycle data CSVs.  The charge
    subset is binned to (N, 501, 5) then strided/outlier-dropped to
    (N, 251, 4); discharge bins to (N, 134, 5)."""
    d = Path(root) / "nasa"
    (d / "cleaned_dataset" / "data").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    files = [f"{i:05d}.csv" for i in range(n_files)]
    other = "discharge" if kind == "charge" else "charge"
    meta = pd.DataFrame(
        {
            "type": [kind] * n_files + [other],
            "filename": files + ["99999.csv"],
            "battery_id": ["B05"] * (n_files + 1),
        }
    )
    meta.to_csv(d / "cleaned_dataset" / "metadata.csv", index=False)
    # bin 10s / cutoff 5000 (charge) or 15s / 2000 (discharge): 5s samples
    # spanning past the cutoff satisfy both.  The load/charge column pair
    # differs per subset (preprocessing.py charge vs discharge features).
    t = np.arange(0, 5100, 5.0)
    extra = (
        ("Current_charge", "Voltage_charge")
        if kind == "charge"
        else ("Current_load", "Voltage_load")
    )
    for f in files:
        pd.DataFrame(
            {
                "Voltage_measured": rng.uniform(3, 4, len(t)),
                "Current_measured": rng.uniform(-1, 2, len(t)),
                "Temperature_measured": rng.uniform(20, 40, len(t)),
                extra[0]: rng.uniform(0, 2, len(t)),
                extra[1]: rng.uniform(4, 5, len(t)),
                "Time": t,
            }
        ).to_csv(d / "cleaned_dataset" / "data" / f, index=False)
    return d


def write_droughts_fixture(root: Path,
                           fips: tuple = (1001, 1003, 1005, 1007, 1009, 1011),
                           seed: int = 3) -> Path:
    """train_timeseries.csv: daily county meteorology; NaN-bearing columns
    (weekly drought score) are dropped, then T2M-correlated features
    {4,5,6,7,9} are removed."""
    d = Path(root) / "droughts"
    (d / "train_timeseries").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    dates = pd.date_range("2010-12-25", "2012-01-10", freq="D")
    feats = [
        "PRECTOT", "PS", "QV2M", "T2M", "T2MDEW", "T2MWET", "T2M_MAX",
        "T2M_MIN", "T2M_RANGE", "TS", "WS10M", "WS50M",
    ]
    rows = []
    for county in fips:
        for date in dates:
            row = {"fips": county, "date": date}
            row.update({f: rng.uniform(0, 10) for f in feats})
            # weekly score: NaN except Tuesdays (forces dropna(axis=1))
            row["score"] = rng.uniform(0, 5) if date.dayofweek == 1 else np.nan
            rows.append(row)
    pd.DataFrame(rows).to_csv(
        d / "train_timeseries" / "train_timeseries.csv", index=False
    )
    return d


def mimic_fixture_frames(n_features: int = 104, n_subjects: int = 6,
                         hours: int = 30, seed: int = 4):
    """MIMIC-Extract-shaped (statics, vitals_labs) frames: MultiIndex
    subject/hadm/icustay(/hours_in) rows, (LEVEL2, Aggregation Function)
    columns with mean/count pairs and sprinkled missingness."""
    rng = np.random.default_rng(seed)
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
    idx = pd.MultiIndex.from_tuples(
        [(s, s + 100, s + 200, t) for s in sub for t in range(hours)],
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


def write_mimic_fixture(root: Path, n_features: int = 104,
                        n_subjects: int = 6, seed: int = 4) -> Path:
    """Write ``all_hourly_data.h5`` (pandas/pytables where available, the
    h5py fixed-format writer otherwise — fdtpu.data.hdf_fixed)."""
    d = Path(root) / "mimiciii"
    d.mkdir(parents=True, exist_ok=True)
    statics, df = mimic_fixture_frames(
        n_features=n_features, n_subjects=n_subjects, seed=seed
    )
    path = d / "all_hourly_data.h5"
    try:
        statics.to_hdf(path, key="patients", mode="w")
        df.to_hdf(path, key="vitals_labs")
    except ImportError:
        from fdtpu.data.hdf_fixed import write_fixed_frame

        write_fixed_frame(statics, path, "patients", mode="w")
        write_fixed_frame(df, path, "vitals_labs")
    return d
