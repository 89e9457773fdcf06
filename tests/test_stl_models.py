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


def test_siegel_repeated_medians_recovers_line():
    from anofox_forecast_ray.kernels.mfles import siegel_repeated_medians

    i = np.arange(80, dtype=float)
    slope, intercept = siegel_repeated_medians(3.0 + 0.5 * i)
    assert slope == pytest.approx(0.5, abs=1e-9)
    assert intercept == pytest.approx(3.0, abs=1e-9)
    # 10% gross outliers must not move the fit (repeated medians have
    # 50% breakdown)
    y = 3.0 + 0.5 * i
    y[::10] += 500.0
    slope, intercept = siegel_repeated_medians(y)
    assert slope == pytest.approx(0.5, abs=0.05)
    assert intercept == pytest.approx(3.0, abs=2.0)


def test_mfles_robust_mode_resists_outliers():
    from anofox_forecast_ray.models import make_model

    rng = np.random.default_rng(9)
    i = np.arange(120, dtype=float)
    y = 20.0 + 0.8 * i + rng.normal(0, 1.0, 120)
    y[::15] += 300.0  # contamination
    plain = make_model("mfles", season_length=0, robust=False,
                       trend_penalty=False).fit(y)
    robust = make_model("mfles", season_length=0, robust=True,
                        trend_penalty=False).fit(y)
    assert robust.state.robust and not plain.state.robust
    true_next = 20.0 + 0.8 * 125.0
    err_r = abs(robust.predict(6)[-1] - true_next)
    err_p = abs(plain.predict(6)[-1] - true_next)
    assert err_r < err_p  # Siegel line ignores the spikes


def test_mfles_robust_auto_detection():
    from anofox_forecast_ray.kernels.mfles import mfles_fit

    rng = np.random.default_rng(2)
    # wild CoV: heavy-tailed noise around a small mean triggers the
    # statsforecast CoV > 0.7 rule
    y = np.abs(rng.standard_cauchy(100)) * 10.0 + 1.0
    st = mfles_fit(y, season_length=0)
    assert st.robust
    # clean strong-mean series stays non-robust
    st2 = mfles_fit(100.0 + np.sin(np.arange(100) * 0.3), season_length=0)
    assert not st2.robust


def test_mfles_trend_penalty_shrinks_weak_trend():
    from anofox_forecast_ray.kernels.mfles import mfles_fit, mfles_predict

    rng = np.random.default_rng(4)
    # pure noise: first-fit R^2 ~ 0 -> penalized forecast goes flat
    y = 50.0 + rng.normal(0, 5.0, 200)
    pen = mfles_fit(y, season_length=0, robust=False, trend_penalty=True)
    nopen = mfles_fit(y, season_length=0, robust=False, trend_penalty=False)
    assert pen.penalty is not None and pen.penalty < 0.2
    h = 50
    drift_pen = abs(mfles_predict(pen, h)[-1] - mfles_predict(pen, 1)[0])
    drift_nopen = abs(
        mfles_predict(nopen, h)[-1] - mfles_predict(nopen, 1)[0]
    )
    assert drift_pen <= drift_nopen
    # strong trend: penalty ~ 1, forecast keeps the slope
    y2 = 10.0 + 2.0 * np.arange(200) + rng.normal(0, 1.0, 200)
    st2 = mfles_fit(y2, season_length=0, robust=False, trend_penalty=True)
    assert st2.penalty > 0.95


def test_tbats_harmonics_by_aic_picks_true_k():
    """Synthetic two-harmonic period-12 series: the K sweep's AIC must
    select K=2 (extra harmonics add 4+ AIC points of seed-state/gamma
    cost without reducing SSE)."""
    from anofox_forecast_ray.kernels.tbats import tbats_fit

    rng = np.random.default_rng(6)
    i = np.arange(120, dtype=float)
    y = (
        50.0
        + 6.0 * np.sin(2 * np.pi * i / 12.0)
        + 3.0 * np.cos(2 * np.pi * 2.0 * i / 12.0)
        + rng.normal(0, 0.3, 120)
    )
    aics = {}
    for k in (1, 2, 3, 4, 5, 6):
        st = tbats_fit(y, periods=(12,), use_box_cox=False, fourier_k=[k])
        aics[k] = st.aic
    assert min(aics, key=aics.get) == 2, aics


def test_tbats_arma_errors_fit_and_improve():
    """MA(1)-correlated innovations (which the exponential state filter
    cannot absorb, unlike AR noise): the MA error model must be estimated,
    drop the AIC by a wide margin, and beat the plain model out of
    sample."""
    from anofox_forecast_ray.kernels.tbats import tbats_fit, tbats_predict

    rng = np.random.default_rng(8)
    n = 150
    i = np.arange(n, dtype=float)
    w = rng.normal(0, 1.0, n)
    e = np.empty(n)
    e[0] = w[0]
    for t in range(1, n):
        e[t] = w[t] - 0.85 * w[t - 1]
    y = 30.0 + 4.0 * np.sin(2 * np.pi * i / 12.0) + e
    plain = tbats_fit(y[:-5], periods=(12,), use_box_cox=False)
    arma = tbats_fit(y[:-5], periods=(12,), use_box_cox=False,
                     arma_p=0, arma_q=1)
    assert arma.arma is not None
    assert -0.95 < arma.arma.ma[0] < -0.3  # recovers the MA(1) sign/scale
    assert arma.aic < plain.aic - 10.0
    actual = y[-5:]
    err_arma = np.abs(tbats_predict(arma, 5) - actual).mean()
    err_plain = np.abs(tbats_predict(plain, 5) - actual).mean()
    assert err_arma < err_plain


def test_auto_tbats_aic_sweep():
    from anofox_forecast_ray.models import make_model

    rng = np.random.default_rng(10)
    i = np.arange(96, dtype=float)
    y = 40.0 + 5.0 * np.sin(2 * np.pi * i / 12.0) + rng.normal(0, 0.5, 96)
    m = make_model("auto_tbats", periods=(12,), try_box_cox=False,
                   try_damped=False)
    m.fit(y)
    assert np.isfinite(m.state.aic)
    assert m.state.ks[0] <= 3  # one true harmonic: AIC must not pick max K
    fc = m.predict(12)
    assert np.isfinite(fc).all()
    # forecast tracks the seasonal swing
    assert fc.max() - fc.min() > 5.0


# --- round-5: stl.rs parameter-derivation parity (VERDICT r4 item 5) ------

def _gen_seasonal(n, period):
    """Replica of stl.rs tests::generate_seasonal_series."""
    i = np.arange(n, dtype=np.float64)
    return 0.1 * i + 10.0 * np.sin(2 * np.pi * i / period)


def test_stl_nt_derives_from_raw_period():
    """stl.rs:83-85 computes nt from the raw period (before odd-forcing
    ns): m=4 must give nt=11, not the 9 the odd-forced formula yields."""
    import math

    for m, want in ((4, 11), (8, 15), (10, 19), (12, 21), (7, 15)):
        nt = max(0, math.ceil(1.5 * m / (1.0 - 1.5 / m)))
        nt = nt + 1 if nt % 2 == 0 else nt
        assert nt == want, (m, nt, want)


def test_stl_reference_unit_fixtures():
    """The four stl.rs unit tests, plus 1e-8-pinned component values from
    the parity implementation (regression pin for the nt/robustness/
    variance alignment)."""
    from anofox_forecast_ray.kernels.stl import _sample_var, stl_decompose

    y = _gen_seasonal(120, 12)
    r = stl_decompose(y, 12)
    # stl_basic_decomposition: exact additive reconstruction
    assert np.max(np.abs(y - (r.trend + r.seasonal + r.remainder))) < 1e-10
    # stl_detects_seasonality
    assert r.seasonal_strength() > 0.5
    # stl_detects_trend
    i = np.arange(120, dtype=np.float64)
    r2 = stl_decompose(2.0 * i + 0.1 * np.sin(2 * np.pi * i / 12.0), 12)
    assert r2.trend_strength() > 0.9
    # stl_trend_only (period 10, EVEN — exercises the raw-m nt rule)
    r3 = stl_decompose(5.0 + 0.5 * np.arange(100, dtype=np.float64), 10)
    assert _sample_var(r3.seasonal) < _sample_var(
        5.0 + 0.5 * np.arange(100, dtype=np.float64)
    ) * 0.1
    # stl_constant_series: all components finite, remainder ~0
    r4 = stl_decompose(np.full(100, 5.0), 10)
    assert np.max(np.abs(r4.remainder)) < 1e-10

    # pinned component values (1e-8): regenerate ONLY on a deliberate
    # semantics change
    pins = {
        0: (1.7526143354871444, -1.8753741760005158),
        30: (3.0037819134641994, 0.011308518742572549),
        60: (5.999272537770877, -0.052731137053043116),
        119: (10.517106623150003, -3.575818275487444),
    }
    for k, (tr, se) in pins.items():
        assert abs(float(r.trend[k]) - tr) < 1e-8, k
        assert abs(float(r.seasonal[k]) - se) < 1e-8, k
    # even-period pin (nt=11 path)
    r5 = stl_decompose(_gen_seasonal(80, 4), 4)
    assert r5.seasonal_strength() > 0.999
    assert abs(float(r5.trend[10]) - 0.9908086608149492) < 1e-8
    assert abs(float(r5.seasonal[10]) - 0.01227005044456729) < 1e-8


def test_stl_robustness_weights_reference_form():
    """Outer-loop weights: bisquare with hard zero at u >= 1 and the
    1e-10 all-ones floor (stl.rs:365-396) — an outlier beyond 6*med|r|
    must get weight EXACTLY 0 (the pre-r5 clip form gave it ~0 but the
    floor/zero branches differed)."""
    from anofox_forecast_ray.kernels.stl import stl_decompose

    rng = np.random.default_rng(0)
    y = _gen_seasonal(96, 12) + rng.normal(0, 0.5, 96)
    y[50] += 500.0  # gross outlier
    r_rob = stl_decompose(y, 12, outer_iterations=6)
    r_plain = stl_decompose(y, 12)
    # robust fit must track the clean series better away from the spike
    clean = _gen_seasonal(96, 12)
    mask = np.ones(96, bool)
    mask[45:56] = False
    err_rob = np.mean(np.abs((r_rob.trend + r_rob.seasonal - clean))[mask])
    err_plain = np.mean(
        np.abs((r_plain.trend + r_plain.seasonal - clean))[mask]
    )
    assert err_rob < err_plain
