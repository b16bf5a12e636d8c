"""End-to-end raw-file fixtures for the real datamodules.

Each test writes a tiny file tree with the REAL dataset's schema (via the
shared writers in fdtpu.data.fixtures — column names, layouts, units;
reference dataloaders/datamodules.py:187-229, 406-410, 469-476, 530-537
and utils/preprocessing.py) and drives
``prepare_data → setup → dataset_parameters → train_dataloader`` through
it, so a schema drift against the upstream files is caught by the suite."""

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
from fdtpu.data.fixtures import (
    mimic_fixture_frames,
    write_droughts_fixture,
    write_ecg_fixture,
    write_mimic_fixture,
    write_nasa_fixture,
    write_nasdaq_fixture,
)


def _drive(dm):
    dm.prepare_data()
    dm.setup("fit")
    params = dm.dataset_parameters
    batch = next(iter(dm.train_dataloader()))
    assert batch.shape[1:] == (params["max_len"], params["n_channels"])
    assert np.isfinite(batch).all()
    return params


def test_ecg_raw_csv_fixture():
    root = Path(tempfile.mkdtemp())
    write_ecg_fixture(root, n_train=30, n_test=10)
    dm = ECGDatamodule(data_dir=root, batch_size=4)
    params = _drive(dm)
    assert params["max_len"] == 187
    assert params["n_channels"] == 1
    # header quirk: one row consumed
    assert dm.X_train.shape == (29, 187, 1)


def test_nasdaq_raw_stock_csvs_fixture():
    root = Path(tempfile.mkdtemp())
    write_nasdaq_fixture(root, n_stocks=3, with_holey_stock=True)
    dm = NASDAQDatamodule(data_dir=root, batch_size=2)
    params = _drive(dm)
    assert params["max_len"] == 252
    assert params["n_channels"] == 5  # volume dropped
    # the holey stock (251 days) is filtered out
    assert dm.X_train.shape[0] + dm.X_test.shape[0] == 3


def test_nasa_raw_battery_fixture():
    root = Path(tempfile.mkdtemp())
    write_nasa_fixture(root, n_files=3, kind="charge")
    dm = NASADatamodule(data_dir=root, batch_size=2, subdataset="charge")
    params = _drive(dm)
    assert params["max_len"] == 251
    assert params["n_channels"] == 4


def test_droughts_raw_timeseries_fixture():
    root = Path(tempfile.mkdtemp())
    write_droughts_fixture(root, fips=(1001, 1003))
    dm = USDroughtsDatamodule(data_dir=root, batch_size=1)
    params = _drive(dm)
    assert params["max_len"] == 365
    assert params["n_channels"] == 12 - 5  # {4,5,6,7,9} dropped


# ----------------------------------------------------------------- MIMIC-III
def test_mimic_frames_pipeline_fixture():
    """Frame-level MIMIC pipeline on a schema-accurate fixture."""
    from fdtpu.data.preprocessing import mimic_preprocess_frames

    d = Path(tempfile.mkdtemp())
    statics, df = mimic_fixture_frames(n_features=12)
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


def test_mimic_h5_full_datamodule_fixture():
    """The full 104-feature h5 path through the datamodule: h5 read
    (pytables or the h5py fixed-format fallback) → imputation → (N,24,104)
    tensors → top-variance feature cut."""
    root = Path(tempfile.mkdtemp())
    write_mimic_fixture(root, n_features=104, n_subjects=6)
    dm = MIMICIIIDatamodule(data_dir=root, batch_size=2, n_feats=40)
    params = _drive(dm)
    assert params["max_len"] == 24
    assert params["n_channels"] == 40


def test_mimic_h5_roundtrip_fixture():
    """Full h5 path: pd.read_hdf where pytables is installed, the h5py
    fixed-format fallback otherwise — either way the read + pipeline run."""
    d = Path(tempfile.mkdtemp())
    (d / "mimiciii").mkdir()
    write_mimic_fixture(d, n_features=12)
    from fdtpu.data.preprocessing import mimic_preprocess

    with pytest.raises(AssertionError):
        # 12-feature fixture vs the hard (24, 104) shape assert: the h5 read
        # and pipeline run; only the final shape gate trips.
        mimic_preprocess(d / "mimiciii", random_seed=0)


def test_hdf_fixed_frame_roundtrip():
    """The h5py fixed-format writer/reader round-trips both MIMIC frame
    shapes exactly: MultiIndex index + plain columns (statics, mixed
    int/float blocks) and MultiIndex index + MultiIndex columns with NaNs
    (vitals_labs)."""
    from fdtpu.data.hdf_fixed import read_fixed_frame, write_fixed_frame

    d = Path(tempfile.mkdtemp())
    statics, df = mimic_fixture_frames(n_features=7)
    path = d / "roundtrip.h5"
    write_fixed_frame(statics, path, "patients", mode="w")
    write_fixed_frame(df, path, "vitals_labs")

    statics_rt = read_fixed_frame(path, "patients")
    pd.testing.assert_frame_equal(statics_rt, statics)
    df_rt = read_fixed_frame(path, "vitals_labs")
    pd.testing.assert_frame_equal(df_rt, df)

    # Where pytables exists, the same file must open through pandas too.
    try:
        pd.testing.assert_frame_equal(
            pd.read_hdf(path, "patients"), statics
        )
    except ImportError:
        pass
