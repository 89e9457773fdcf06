"""Frequency parsing/grids (incl. month-end clamping fixtures,
time_series.rs:1630-1918), OLS exog, AutoTheta."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.frequency import (
    Frequency,
    add_months_epoch,
    fill_gaps_timestamps,
    generate_timestamps,
    infer_frequency,
    parse_frequency,
)
from anofox_forecast_ray.kernels.ols import ols_fit, ols_predict, ols_residuals


def _epoch(y, mo, d, h=0):
    from datetime import datetime, timezone

    return int(datetime(y, mo, d, h, tzinfo=timezone.utc).timestamp())


def test_parse_frequency():
    assert parse_frequency("30s") == Frequency("duration", 30)
    assert parse_frequency("30m") == Frequency("duration", 1800)
    assert parse_frequency("1h") == Frequency("duration", 3600)
    assert parse_frequency("1d") == Frequency("duration", 86400)
    assert parse_frequency("1w") == Frequency("duration", 604800)
    assert parse_frequency("1mo") == Frequency("months", 1)
    assert parse_frequency("1q") == Frequency("months", 3)
    assert parse_frequency("2y") == Frequency("years", 2)
    for bad in ("xx", "1z", "mo"):
        with pytest.raises(ValueError):
            parse_frequency(bad)


def test_add_months_clamping():
    # Jan 31 2020 + 1mo -> Feb 29 2020 (leap); 2021 -> Feb 28
    assert add_months_epoch(_epoch(2020, 1, 31), 1) == _epoch(2020, 2, 29)
    assert add_months_epoch(_epoch(2021, 1, 31), 1) == _epoch(2021, 2, 28)
    assert add_months_epoch(_epoch(2020, 3, 31), 1) == _epoch(2020, 4, 30)
    assert add_months_epoch(_epoch(2020, 11, 30), 3) == _epoch(2021, 2, 28)


def test_generate_timestamps_grids():
    g = generate_timestamps(_epoch(2024, 1, 1), _epoch(2024, 1, 1, 4),
                            parse_frequency("1h"))
    assert g.size == 5 and g[1] - g[0] == 3600
    # iterative month stepping (reference :990-998): the clamp propagates —
    # Jan 31 -> Feb 29 -> Mar 29 -> Apr 29
    gm = generate_timestamps(_epoch(2020, 1, 31), _epoch(2020, 5, 1),
                             parse_frequency("1mo"))
    assert gm.tolist() == [
        _epoch(2020, 1, 31), _epoch(2020, 2, 29),
        _epoch(2020, 3, 29), _epoch(2020, 4, 29),
    ]


def test_infer_frequency():
    ts = np.array([0, 3600, 7200, 10800, 14400])
    assert infer_frequency(ts) == 3600
    # with one gap: modal still 1h
    ts2 = np.array([0, 3600, 7200, 14400, 18000])
    assert infer_frequency(ts2, tolerance=0.5) == 3600
    with pytest.raises(ValueError):
        infer_frequency(np.array([0, 1, 3, 6, 10]), tolerance=0.5)


def test_fill_gaps_timestamps_hourly_hole():
    # reference fixture: hourly with hole at 2:00 -> len 5, NaN at idx 2
    base = _epoch(2024, 1, 1)
    ts = np.array([base, base + 3600, base + 3 * 3600, base + 4 * 3600])
    vals = np.array([0.0, 1.0, 3.0, 4.0])
    grid, dense, filled = fill_gaps_timestamps(ts, vals, parse_frequency("1h"))
    assert grid.size == 5
    assert np.isnan(dense[2]) and dense[3] == 3.0
    assert filled.tolist() == [False, False, True, False, False]


def test_ols_fit_and_residuals():
    rng = np.random.default_rng(0)
    n = 200
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = 3.0 + 2.0 * x1 - 1.5 * x2 + rng.normal(0, 0.01, n)
    res = ols_fit(y, {"x1": x1, "x2": x2})
    assert res.intercept == pytest.approx(3.0, abs=0.01)
    coef = dict(zip(res.regressor_names, res.coefficients))
    assert coef["x1"] == pytest.approx(2.0, abs=0.01)
    assert coef["x2"] == pytest.approx(-1.5, abs=0.01)
    assert res.r_squared > 0.999
    r = ols_residuals(y, res, {"x1": x1, "x2": x2})
    assert np.abs(r).mean() < 0.02


def test_exog_adjusted_model():
    from anofox_forecast_ray.models import ExogAdjusted, Naive

    rng = np.random.default_rng(1)
    n = 80
    x = np.sin(np.arange(n) / 4)
    y = 10.0 + 5.0 * x + rng.normal(0, 0.05, n)
    fut_x = np.sin((n + np.arange(4)) / 4)
    m = ExogAdjusted(Naive(), {"x": x}, {"x": fut_x}).fit(y)
    pred = m.predict(4)
    want = 10.0 + 5.0 * fut_x
    np.testing.assert_allclose(pred, want, atol=0.3)


def test_auto_theta():
    from anofox_forecast_ray.models import AutoTheta

    y = 10 + 2 * np.arange(60) + np.random.default_rng(2).normal(0, 1, 60)
    m = AutoTheta().fit(y)
    p = m.predict(3)
    assert p.shape == (3,) and np.isfinite(p).all()
    # forecast continues near the trend's end (dynamic variants flatten
    # the per-step increments, so only proximity is asserted)
    assert abs(p[0] - (10 + 2 * 60)) < 15
    assert m.name() == "AutoTheta"


def test_calendar_annotations():
    from anofox_forecast_ray.kernels.frequency import (
        CalendarAnnotations,
        infer_frequency_calendar,
    )

    # 2024-01-01 was a Monday
    mon = _epoch(2024, 1, 1)
    sat = _epoch(2024, 1, 6)
    cal = CalendarAnnotations(holidays=[mon])
    assert cal.is_holiday(mon) and cal.is_holiday(mon + 3600)
    assert not cal.is_business_day(mon)        # holiday
    assert not cal.is_business_day(sat)        # weekend
    assert cal.is_business_day(_epoch(2024, 1, 2))
    mask = cal.business_day_mask(
        np.array([mon, mon + 86400, sat, sat + 86400 * 2])
    )
    assert mask.tolist() == [False, True, False, True]

    # daily business series with weekends skipped: calendar-aware modal
    # delta over business days = 1d
    days = []
    d = _epoch(2024, 1, 1)
    while len(days) < 15:
        if CalendarAnnotations().is_business_day(d):
            days.append(d)
        d += 86400
    assert infer_frequency_calendar(np.array(days), CalendarAnnotations()) == 86400


def test_series_csv_roundtrip(tmp_path):
    import pandas as pd

    from anofox_forecast_ray.sources.series_csv import load_series_csv

    ts = pd.date_range("2020-01-01", periods=10, freq="30D")
    vals = np.arange(10.0) + 0.5
    p = tmp_path / "stationary.csv"
    pd.DataFrame({"timestamp": ts, "value": vals}).to_csv(p, index=False)
    t = load_series_csv(str(p))
    assert t.column("series_id").to_pylist() == ["stationary"] * 10
    assert t.column("value").to_pylist() == vals.tolist()
    e = t.column("ts").to_numpy()
    assert e[1] - e[0] == 30 * 86400
