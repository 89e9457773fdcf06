"""Missing-value kernels pinned to reference fixtures (FIXTURES.md §3).

LOCF:   y=[1,NaN,3,Inf,5] -> [1,1,3,3,5]     (time_series.rs:1358-1382)
Linear: y=[1,NaN,NaN,4,5] -> [1,2,3,4,5]     (time_series.rs:1428-1462)
Gap-fill: hole at slot 2 of 5 -> NaN inserted (time_series.rs:1630-1918)
"""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.fillna import (
    fill_gaps_grid,
    gap_fill_series,
    interpolate,
    locf,
    sanitize,
)


def test_locf_reference_fixture():
    y = np.array([1.0, np.nan, 3.0, np.inf, 5.0])
    assert locf(y).tolist() == [1, 1, 3, 3, 5]


def test_locf_leading_nan_stays():
    y = np.array([np.nan, np.nan, 2.0, np.nan])
    out = locf(y)
    assert np.isnan(out[0]) and np.isnan(out[1])
    assert out[2:].tolist() == [2, 2]


def test_interpolate_reference_fixture():
    y = np.array([1.0, np.nan, np.nan, 4.0, 5.0])
    assert interpolate(y).tolist() == [1, 2, 3, 4, 5]


def test_interpolate_edges():
    y = np.array([np.nan, 2.0, np.nan, 4.0, np.nan])
    out = interpolate(y, fill_edges=False)
    assert np.isnan(out[0]) and np.isnan(out[4]) and out[2] == 3.0
    out2 = interpolate(y, fill_edges=True)
    assert out2.tolist() == [2, 2, 3, 4, 4]


def test_sanitize_policies():
    y = np.array([1.0, np.nan, 3.0])
    v, keep = sanitize(y, "drop")
    assert v.tolist() == [1, 3] and keep.tolist() == [0, 2]
    v, _ = sanitize(y, "fill", fill_value=-1.0)
    assert v.tolist() == [1, -1, 3]
    with pytest.raises(ValueError):
        sanitize(y, "error")
    clean = np.array([1.0, 2.0])
    v, _ = sanitize(clean, "error")
    assert v.tolist() == [1, 2]


def test_fill_gaps_grid_hole():
    grid, dense, filled = fill_gaps_grid(
        np.array([0, 1, 3, 4]), np.array([0.0, 1.0, 3.0, 4.0])
    )
    assert grid.tolist() == [0, 1, 2, 3, 4]
    assert np.isnan(dense[2]) and dense[3] == 3.0
    assert filled.tolist() == [False, False, True, False, False]


def test_gap_fill_series_locf_and_linear():
    ids = np.array([1, 4])
    vals = np.array([10.0, 40.0])
    grid, v, filled = gap_fill_series(ids, vals, method="locf", start=0)
    assert grid.tolist() == [0, 1, 2, 3, 4]
    assert np.isnan(v[0]) and v[1:].tolist() == [10, 10, 10, 40]
    assert filled.tolist() == [True, False, True, True, False]
    _, v2, _ = gap_fill_series(ids, vals, method="linear", start=0)
    assert np.isnan(v2[0]) and v2[1:].tolist() == [10, 20, 30, 40]
