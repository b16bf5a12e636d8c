"""Preprocessing-pipeline tests on synthetic fixture files.

The reference never tests its preprocessing (SURVEY.md §4 gaps); these build
miniature raw-data trees matching each dataset's on-disk format and check the
pipelines' filters and output shapes.
"""

import numpy as np
import pandas as pd
import pytest

from fdtpu.data.preprocessing import (
    droughts_preprocess,
    load_tensor,
    nasa_preprocess,
    nasdaq_preprocess,
    save_split,
)


def test_save_and_load_split(tmp_path):
    x = np.random.RandomState(0).randn(20, 10, 2).astype(np.float32)
    save_split(tmp_path, x, train_frac=0.8, seed=0)
    tr = load_tensor(tmp_path / "X_train")
    te = load_tensor(tmp_path / "X_test")
    assert tr.shape == (16, 10, 2)
    assert te.shape == (4, 10, 2)
    # Split is a permutation of the input rows.
    all_rows = np.concatenate([tr, te])
    assert sorted(map(tuple, all_rows.reshape(20, -1)[:, :3])) == sorted(
        map(tuple, x.reshape(20, -1)[:, :3])
    )


def test_load_tensor_pt_compat(tmp_path):
    torch = pytest.importorskip("torch")
    x = torch.randn(5, 4, 2)
    torch.save(x, tmp_path / "X_train.pt")
    loaded = load_tensor(tmp_path / "X_train")
    np.testing.assert_allclose(loaded, x.numpy())


def _write_stock(path, name, dates, base=100.0):
    df = pd.DataFrame(
        {
            "Date": dates.strftime("%Y-%m-%d"),
            "Open": base,
            "High": base + 1,
            "Low": base - 1,
            "Close": base + 0.5,
            "Adj Close": base + 0.4,
            "Volume": 1000,
        }
    )
    df.to_csv(path / f"{name}.csv", index=False)


def test_nasdaq_preprocess(tmp_path):
    stocks = tmp_path / "stocks"
    stocks.mkdir()
    # 2019 has 252 trading days in the reference filter; build 252 business
    # days inside 2019 plus coverage before/after.
    bdays_2019 = pd.bdate_range("2019-01-01", "2019-12-31")[:252]
    full = pd.DatetimeIndex(
        [pd.Timestamp("2018-12-28")] + list(bdays_2019) + [pd.Timestamp("2020-01-02")]
    )
    _write_stock(stocks, "GOOD1", full)
    _write_stock(stocks, "GOOD2", full, base=50.0)
    # Starts too late → filtered out.
    _write_stock(stocks, "LATE", pd.DatetimeIndex(list(bdays_2019[5:]) + [pd.Timestamp("2020-01-02")]))
    # Missing days → filtered out.
    _write_stock(
        stocks, "GAPPY",
        pd.DatetimeIndex([pd.Timestamp("2018-12-28")] + list(bdays_2019[::2]) + [pd.Timestamp("2020-01-02")]),
    )

    nasdaq_preprocess(tmp_path, random_seed=0, train_frac=0.5)
    tr = load_tensor(tmp_path / "X_train")
    te = load_tensor(tmp_path / "X_test")
    assert tr.shape == (1, 252, 6)
    assert te.shape == (1, 252, 6)


def test_nasa_preprocess(tmp_path):
    root = tmp_path / "cleaned_dataset"
    data_dir = root / "data"
    data_dir.mkdir(parents=True)
    files, types = [], []
    rng = np.random.RandomState(0)
    for i in range(3):
        t = np.arange(0, 5500, 5.0)  # max interval 5 < bin 10, max time > cutoff
        df = pd.DataFrame(
            {
                "Time": t,
                "Voltage_measured": rng.rand(len(t)),
                "Current_measured": rng.rand(len(t)),
                "Temperature_measured": rng.rand(len(t)),
                "Current_charge": rng.rand(len(t)),
                "Voltage_charge": rng.rand(len(t)),
            }
        )
        name = f"cycle{i}.csv"
        df.to_csv(data_dir / name, index=False)
        files.append(name)
        types.append("charge")
    # A too-sparse file that must be filtered (interval > bin).
    t_sparse = np.arange(0, 6000, 50.0)
    pd.DataFrame(
        {
            "Time": t_sparse,
            "Voltage_measured": 1.0,
            "Current_measured": 1.0,
            "Temperature_measured": 1.0,
            "Current_charge": 1.0,
            "Voltage_charge": 1.0,
        }
    ).to_csv(data_dir / "sparse.csv", index=False)
    files.append("sparse.csv")
    types.append("charge")
    pd.DataFrame({"filename": files, "type": types}).to_csv(
        root / "metadata.csv", index=False
    )

    nasa_preprocess(tmp_path, subdataset="charge", train_frac=0.67, random_seed=0)
    tr = load_tensor(tmp_path / "charge" / "X_train")
    te = load_tensor(tmp_path / "charge" / "X_test")
    # 3 valid cycles; 5000//10 + 1 = 501 bins × 5 features.
    assert tr.shape[1:] == (501, 5)
    assert te.shape[1:] == (501, 5)
    assert tr.shape[0] + te.shape[0] == 3


def test_droughts_preprocess(tmp_path):
    ts_dir = tmp_path / "train_timeseries"
    ts_dir.mkdir()
    dates = pd.date_range("2010-12-01", "2012-02-01", freq="D")
    rows = []
    rng = np.random.RandomState(1)
    for fips in (1001, 1002):
        for d in dates:
            rows.append(
                {
                    "fips": fips,
                    "date": d.strftime("%Y-%m-%d"),
                    "PRECTOT": rng.rand(),
                    "PS": rng.rand(),
                    "T2M": rng.rand(),
                    "score": np.nan,  # NaN column must be dropped
                }
            )
    pd.DataFrame(rows).to_csv(ts_dir / "train_timeseries.csv", index=False)

    droughts_preprocess(tmp_path, random_seed=0, train_frac=0.5)
    tr = load_tensor(tmp_path / "X_train")
    te = load_tensor(tmp_path / "X_test")
    assert tr.shape == (1, 365, 3)  # one year, NaN column dropped
    assert te.shape == (1, 365, 3)
