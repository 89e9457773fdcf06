"""STL/MSTL decomposition + second-wave model tests."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.stl import mstl_decompose, stl_decompose
from anofox_forecast_ray.models import (
    ADIDA,
    IMAPA,
    TSB,
    Ensemble,
    Holt,
    HoltWinters,
    MSTLForecaster,
    Naive,
    SES,
    SeasonalES,
    make_model,
)


def _seasonal_series(n=120, m=12, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        50 + 0.2 * t + 10 * np.sin(2 * np.pi * t / m) + rng.normal(0, noise, n)
    )


def test_stl_recovers_components():
    y = _seasonal_series()
    res = stl_decompose(y, 12)
    assert res is not None
    # exact reconstruction by construction
    np.testing.assert_allclose(
        res.trend + res.seasonal + res.remainder, y, rtol=0, atol=1e-9
    )
    assert res.seasonal_strength() > 0.9
    assert res.trend_strength() > 0.8
    # seasonal component should correlate strongly with the true seasonal
    true_seasonal = 10 * np.sin(2 * np.pi * np.arange(120) / 12)
    c = np.corrcoef(res.seasonal, true_seasonal)[0, 1]
    assert c > 0.95
    # too-short series
    assert stl_decompose(np.arange(10.0), 12) is None


def test_stl_robust_downweights_outliers():
    y = _seasonal_series()
    y2 = y.copy()
    y2[60] += 50.0
    plain = stl_decompose(y2, 12)
    robust = stl_decompose(y2, 12, outer_iterations=6)
    true_seasonal = 10 * np.sin(2 * np.pi * np.arange(120) / 12)
    err_plain = np.abs(plain.seasonal - true_seasonal).mean()
    err_robust = np.abs(robust.seasonal - true_seasonal).mean()
    assert err_robust <= err_plain + 1e-9


def test_mstl_two_periods():
    rng = np.random.default_rng(1)
    t = np.arange(24 * 21)
    y = (
        10
        + 5 * np.sin(2 * np.pi * t / 24)
        + 3 * np.sin(2 * np.pi * t / (24 * 7))
        + rng.normal(0, 0.3, t.size)
    )
    dec = mstl_decompose(y, [24, 24 * 7])
    assert dec is not None
    trend, seasonals, remainder = dec
    assert set(seasonals) == {24, 168}
    daily = 5 * np.sin(2 * np.pi * t / 24)
    assert np.corrcoef(seasonals[24], daily)[0, 1] > 0.9


def test_holt_and_holt_winters():
    y = _seasonal_series()
    hw = HoltWinters(period=12).fit(y)
    pred = hw.predict(12)
    assert np.isfinite(pred).all()
    # forecast should continue the seasonal shape: high at the sine peak
    t = 120 + np.arange(12)
    expected = 50 + 0.2 * t + 10 * np.sin(2 * np.pi * t / 12)
    assert np.abs(pred - expected).mean() < 3.0

    trend_y = 5 + 0.7 * np.arange(60) + np.random.default_rng(3).normal(0, 0.5, 60)
    h = Holt().fit(trend_y)
    p = h.predict(4)
    assert np.all(np.diff(p) > 0.4)  # keeps the upward trend


def test_seasonal_es():
    y = np.tile([10.0, 20.0, 30.0, 40.0], 6)
    m = SeasonalES(period=4, alpha=0.5).fit(y)
    pred = m.predict(4)
    np.testing.assert_allclose(pred, [10, 20, 30, 40], atol=1e-9)


def test_imapa_and_tsb_and_adida():
    rng = np.random.default_rng(5)
    y = np.where(rng.random(60) < 0.3, rng.poisson(5, 60) + 1, 0).astype(float)
    for cls in (IMAPA, ADIDA, TSB):
        m = cls().fit(y)
        p = m.predict(3)
        assert p.shape == (3,) and np.isfinite(p).all() and (p >= 0).all(), cls
        # flat forecast around the demand rate
        assert 0 < p[0] < y.max()


def test_mstl_forecaster():
    y = _seasonal_series(n=96)
    m = MSTLForecaster(periods=(12,)).fit(y)
    pred = m.predict(12)
    t = 96 + np.arange(12)
    expected = 50 + 0.2 * t + 10 * np.sin(2 * np.pi * t / 12)
    assert np.abs(pred - expected).mean() < 4.0


def test_ensemble():
    y = _seasonal_series(n=60)
    ens = Ensemble([Naive(), SES(alpha=0.5)], method="mean").fit(y)
    p = ens.predict(3)
    n = Naive().fit(y).predict(3)
    s = SES(alpha=0.5).fit(y).predict(3)
    np.testing.assert_allclose(p, (n + s) / 2)
    med = Ensemble([Naive(), SES(alpha=0.5)], method="median").fit(y).predict(3)
    assert med.shape == (3,)


def test_registry_new_models():
    y = _seasonal_series()
    for name in ("holt", "holt_winters", "seasonal_es", "mstl"):
        m = make_model(name)
        p = m.fit(y).predict(6)
        assert p.shape == (6,) and np.isfinite(p).all(), name


def test_dynamic_theta_tracks_trend():
    from anofox_forecast_ray.models import DynamicOptimizedTheta, DynamicTheta

    rng = np.random.default_rng(7)
    y = 10 + 2.0 * np.arange(80) + rng.normal(0, 1, 80)
    m = DynamicTheta().fit(y)
    pred = m.predict(4)
    # forecasts continue the upward trend from the series end
    assert pred[0] > y[:40].mean()
    assert np.all(np.diff(pred) > 0)
    d = DynamicOptimizedTheta().fit(y)
    p2 = d.predict(4)
    want = 10 + 2.0 * (80 + np.arange(4))
    assert np.abs(p2 - want).mean() < 6.0
    assert 0.01 <= d.state.alpha <= 0.99 and 1.0 <= d.state.theta <= 10.0


def test_auto_theta_includes_dynamic():
    from anofox_forecast_ray.models import AutoTheta

    y = 50 + 10 * np.sin(2 * np.pi * np.arange(96) / 12)
    m = AutoTheta(period=12).fit(y)
    assert m._best is not None
    p = m.predict(12)
    assert np.isfinite(p).all()


def test_mfles_fits_trend_seasonal():
    from anofox_forecast_ray.models import MFLES

    rng = np.random.default_rng(21)
    t = np.arange(120)
    y = 30 + 0.4 * t + 8 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.5, 120)
    # additive mode for linear-growth data (the auto rule would pick the
    # reference's log transform, which models growth as exponential)
    m = MFLES(season_length=12, multiplicative=False).fit(y)
    assert np.abs(m.state.residuals).mean() < 1.0
    pred = m.predict(12)
    tf = 120 + np.arange(12)
    want = 30 + 0.4 * tf + 8 * np.sin(2 * np.pi * tf / 12)
    assert np.abs(pred - want).mean() < 3.0

    # auto rule picks multiplicative for positive seasonal data
    auto = MFLES(season_length=12).fit(y)
    assert auto.state.multiplicative
    neg = y - 100.0
    m2 = MFLES(season_length=12).fit(neg)
    assert not m2.state.multiplicative
    assert np.isfinite(m2.predict(6)).all()


def test_tbats_seasonal_fit():
    from anofox_forecast_ray.models import TBATS, AutoTBATS

    rng = np.random.default_rng(30)
    t = np.arange(144)
    y = 20 + 5 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.3, 144)
    m = TBATS(periods=(12,), use_box_cox=False).fit(y)
    pred = m.predict(6)
    want = 20 + 5 * np.sin(2 * np.pi * (144 + np.arange(6)) / 12)
    assert np.abs(pred - want).mean() < 1.0
    a = AutoTBATS(periods=(12,)).fit(y)
    assert np.isfinite(a.predict(6)).all()
    # registry
    from anofox_forecast_ray.models import make_model
    p = make_model("tbats", periods=(12,), use_box_cox=False).fit(y).predict(3)
    assert p.shape == (3,)
