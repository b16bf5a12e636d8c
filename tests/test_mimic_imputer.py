"""MIMIC imputer test on a synthetic multi-index frame (the h5 reader needs
pytables, unavailable here; the imputation logic is the tricky part)."""

import numpy as np
import pandas as pd

from fdtpu.data.preprocessing import mimic_imputer


def make_frame():
    # Two stays × 4 hours, two features, MIMIC-Extract column structure.
    index = pd.MultiIndex.from_product(
        [[1, 2], [10, 20], [100, 200], range(4)][1:],  # trim: build manually
    )
    rows = []
    for subj, hadm, stay in [(1, 10, 100), (2, 20, 200)]:
        for hour in range(4):
            rows.append((subj, hadm, stay, hour))
    index = pd.MultiIndex.from_tuples(
        rows, names=["subject_id", "hadm_id", "icustay_id", "hours_in"]
    )
    cols = pd.MultiIndex.from_product(
        [["hr", "bp"], ["mean", "count"]], names=["LEVEL2", "Aggregation Function"]
    )
    df = pd.DataFrame(np.nan, index=index, columns=cols)
    # Stay 100: hr observed at hours 0 and 2.
    df.loc[(1, 10, 100, 0), ("hr", "mean")] = 60.0
    df.loc[(1, 10, 100, 0), ("hr", "count")] = 1
    df.loc[(1, 10, 100, 2), ("hr", "mean")] = 80.0
    df.loc[(1, 10, 100, 2), ("hr", "count")] = 1
    # bp never observed for stay 100.
    # Stay 200: bp observed once.
    df.loc[(2, 20, 200, 1), ("bp", "mean")] = 120.0
    df.loc[(2, 20, 200, 1), ("bp", "count")] = 2
    df[("hr", "count")] = df[("hr", "count")].fillna(0)
    df[("bp", "count")] = df[("bp", "count")].fillna(0)
    return df


def test_mimic_imputer_ffill_mean_zero():
    out = mimic_imputer(make_frame())
    assert not out.isnull().any().any()
    idx = pd.IndexSlice

    hr = out.loc[idx[1, 10, 100, :], idx["hr", "mean"]].values
    # hour 0 observed 60; hour 1 ffilled 60; hour 2 observed 80; hour 3 ffilled 80.
    np.testing.assert_allclose(hr, [60, 60, 80, 80])

    # bp for stay 100 never observed → filled with 0.
    bp_100 = out.loc[idx[1, 10, 100, :], idx["bp", "mean"]].values
    np.testing.assert_allclose(bp_100, 0.0)

    # bp for stay 200: hour 0 has no prior obs → stay mean (120); then ffill.
    bp_200 = out.loc[idx[2, 20, 200, :], idx["bp", "mean"]].values
    np.testing.assert_allclose(bp_200, [120, 120, 120, 120])

    # Mask channel marks observed hours.
    mask_hr = out.loc[idx[1, 10, 100, :], idx["hr", "mask"]].values
    np.testing.assert_allclose(mask_hr, [1, 0, 1, 0])

    # time-since-measured grows between observations.
    tsm_hr = out.loc[idx[1, 10, 100, :], idx["hr", "time_since_measured"]].values
    np.testing.assert_allclose(tsm_hr, [0, 1, 0, 1])
