"""Model kernels pinned to the reference's inline unit-test fixtures
(FIXTURES.md §3; reference citations in each test)."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels import baseline as b
from anofox_forecast_ray.kernels import intermittent as ii
from anofox_forecast_ray.kernels import smoothing as s
from anofox_forecast_ray.kernels import theta as t
from anofox_forecast_ray.kernels import windows as w
from anofox_forecast_ray.kernels.optimization import nelder_mead
from anofox_forecast_ray.kernels.stats import quantile_normal


def test_ses_exact_scalar_fixture():
    # ses.rs:342-365 — alpha=.5, y=[10,12,14,13]
    st = s.ses_fit(np.array([10.0, 12, 14, 13]), alpha=0.5)
    assert st.level == pytest.approx(12.75, abs=1e-12)
    assert st.fitted.tolist() == [10, 10, 11, 12.5]
    assert st.residuals.tolist() == [0, 2, 3, 0.5]
    assert s.ses_predict(st, 3).tolist() == [12.75] * 3


def test_ses_scan_matches_loop_long():
    rng = np.random.default_rng(0)
    y = rng.normal(100, 10, 5000)
    for alpha in (0.001, 0.1, 0.5, 0.9, 0.9999):
        got = s.ses_scan(y, alpha)
        lvl = y[0]
        want = np.empty_like(y)
        want[0] = lvl
        for i in range(1, y.size):
            lvl = alpha * y[i] + (1 - alpha) * lvl
            want[i] = lvl
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_ses_interval_factor():
    # ses.rs:200-239: factor 1 + b^2(1-b^(2(h-1)))/(1-b^2)
    st = s.ses_fit(np.array([10.0, 12, 14, 13]), alpha=0.5)
    point, lo, hi = s.ses_intervals(st, 3, 0.95)
    z = quantile_normal(0.975)
    beta2 = 0.25
    factors = [1.0, 1 + beta2 * (1 - beta2) / (1 - beta2), 1 + beta2 * (1 - beta2**2) / (1 - beta2)]
    for h in range(3):
        se = np.sqrt(st.variance * factors[h])
        assert hi[h] - point[h] == pytest.approx(z * se, rel=1e-12)


def test_seasonal_naive_fixtures():
    # seasonal_naive.rs:236-306
    st = b.seasonal_naive_fit(np.array([1.0, 2, 3, 4, 1, 2, 3, 4]), 4)
    assert st.forecast_fn(4).tolist() == [1, 2, 3, 4]
    st2 = b.seasonal_naive_fit(
        np.array([10.0, 20, 30, 40, 11, 21, 31, 41]), 4
    )
    assert st2.forecast_fn(4).tolist() == [11, 21, 31, 41]
    assert st2.forecast_fn(8).tolist() == [11, 21, 31, 41] * 2
    # fitted/residuals (seasonal_naive.rs:309-352)
    st3 = b.seasonal_naive_fit(np.array([1.0, 2, 3, 4, 2, 3, 4, 5]), 4)
    assert np.isnan(st3.fitted[:4]).all()
    assert st3.fitted[4:].tolist() == [1, 2, 3, 4]
    assert st3.residuals[4:].tolist() == [1, 1, 1, 1]
    # interval widening sqrt(k) per completed season
    point, lo, hi = b.simple_intervals(st3, 8, 0.95)
    width1 = hi[0] - point[0]
    width5 = hi[4] - point[4]
    assert width5 == pytest.approx(width1 * np.sqrt(2), rel=1e-12)


def test_naive_fixture():
    # naive.rs:117-140
    y = np.array([3.0, 5, 9, 4])
    st = b.naive_fit(y)
    assert np.isnan(st.fitted[0])
    assert st.fitted[1:].tolist() == [3, 5, 9]
    assert st.residuals[1:].tolist() == [2, 4, -5]
    assert st.forecast_fn(3).tolist() == [4, 4, 4]


def test_rwd_fixture():
    # random_walk.rs:44-95: perfect linear trend -> drift 1
    y = np.array([1.0, 2, 3, 4, 5])
    st = b.rwd_fit(y)
    assert st.forecast_fn(3).tolist() == [6, 7, 8]


def test_rolling_fixtures():
    # window.rs:282-395: y=[1..5], w=3
    y = np.array([1.0, 2, 3, 4, 5])
    assert np.allclose(w.rolling_mean(y, 3)[2:], [2, 3, 4])
    assert np.isnan(w.rolling_mean(y, 3)[:2]).all()
    assert np.allclose(w.rolling_sum(y, 3)[2:], [6, 9, 12])
    assert np.allclose(w.rolling_min(y, 3)[2:], [1, 2, 3])
    assert np.allclose(w.rolling_max(y, 3)[2:], [3, 4, 5])
    assert np.allclose(w.rolling_median(y, 3)[2:], [2, 3, 4])
    # expanding / ewm (window.rs:399-468)
    assert w.expanding_mean(y).tolist() == [1, 1.5, 2, 2.5, 3]
    em = w.ewm_mean(y, 0.5)
    assert em[0] == 1 and em[1] == 1.5
    assert em[2] == pytest.approx(0.5 * 3 + 0.5 * 1.5)


def test_theta_slope_positive_on_trend():
    # theta/model.rs:1087-1099: slope > 0 on y=10+2i
    y = 10.0 + 2.0 * np.arange(30)
    st = t.theta_fit(y)
    assert st.b == pytest.approx(2.0, rel=1e-10)
    # STM forecast formula: level + (1-1/2)*b*(1/alpha + h - 1)
    point = t.theta_predict(st, 2)
    expected_h1 = st.level + 0.5 * st.b * (1 / 0.1 + 1 - 1)
    assert point[0] == pytest.approx(expected_h1, rel=1e-12)


def test_theta_seasonal_test_gate():
    rng = np.random.default_rng(1)
    seasonal = 50 + 10 * np.sin(2 * np.pi * np.arange(96) / 12) + rng.normal(0, 0.5, 96)
    assert t.seasonal_test(seasonal, 12)
    noise = rng.normal(50, 5, 96)
    assert not t.seasonal_test(noise, 12)


def test_ets_ann_equals_ses_recurrence():
    y = np.array([10.0, 12, 14, 13])
    st = s.ets_fit(y, "ANN", optimize=False, alpha=0.5)
    assert st.level == pytest.approx(12.75)
    assert st.fitted.tolist() == [10, 10, 11, 12.5]


def test_ets_aan_trend_recurrence():
    # ets.rs:406-495 AAN arm: hand-stepped
    y = np.array([10.0, 12.0, 14.0])
    st = s.ets_fit(y, "AAN", optimize=False, alpha=0.5, beta=0.5)
    # init: regression on first maxn=3 pts (1-indexed): slope=2, intercept a=8
    # t=0: f=8+2=10; l=.5*10+.5*10=10; b=.5*(10-8)+.5*2=2
    # t=1: f=12; l=.5*12+.5*12=12; b=.5*2+.5*2=2
    # t=2: f=14; l=14; b=2
    assert st.fitted.tolist() == [10, 12, 14]
    assert st.level == pytest.approx(14) and st.trend == pytest.approx(2)
    assert s.ets_predict(st, 2).tolist() == [16, 18]


def test_ets_aan_optimized_recovers_trend():
    y = 5.0 + 0.5 * np.arange(50)
    st = s.ets_fit(y, "AAN")
    pred = s.ets_predict(st, 3)
    want = 5.0 + 0.5 * (50 + np.arange(3))
    np.testing.assert_allclose(pred, want, rtol=1e-3)


def test_croston_fixture():
    # croston.rs semantics: demands/intervals extraction
    y = np.array([0.0, 3, 0, 0, 6, 0, 9, 0])
    d, iv = ii.demands_intervals(y)
    assert d.tolist() == [3, 6, 9]
    assert iv.tolist() == [2, 3, 2]
    st = ii.croston_fit(y, "classic", alpha=0.1)
    # demand SES: l0=3, l=.1*6+.9*3=3.3, l=.1*9+.9*3.3=3.87
    assert st.demand_level == pytest.approx(3.87)
    # interval SES: l0=2, l=.1*3+.9*2=2.1, l=.1*2+.9*2.1=2.09
    assert st.interval_level == pytest.approx(2.09)
    assert st.point == pytest.approx(3.87 / 2.09)
    sba = ii.croston_fit(y, "sba", alpha=0.1)
    assert sba.point == pytest.approx(3.87 / 2.09 * 0.95)


def test_nelder_mead_quadratic():
    # optimization.rs doc example
    res = nelder_mead(
        lambda x: (x[0] - 2.0) ** 2 + (x[1] - 3.0) ** 2, [0.0, 0.0]
    )
    assert res.converged
    assert res.optimal_point[0] == pytest.approx(2.0, abs=0.01)
    assert res.optimal_point[1] == pytest.approx(3.0, abs=0.01)


def test_quantile_normal():
    assert quantile_normal(0.975) == pytest.approx(1.96, abs=0.01)
    assert quantile_normal(0.5) == pytest.approx(0.0, abs=1e-6)
    assert quantile_normal(0.025) == pytest.approx(-1.96, abs=0.01)


def test_registry_roundtrip():
    from anofox_forecast_ray.models import make_model

    y = 50 + 10 * np.sin(2 * np.pi * np.arange(48) / 12)
    for name in ["naive", "ses", "theta", "rwd", "historic_average", "sma"]:
        m = make_model(name)
        p = m.fit(y).predict(4)
        assert p.shape == (4,) and np.isfinite(p).all(), name
    m = make_model("seasonal_naive", period=12)
    p = m.fit(y).predict(12)
    np.testing.assert_allclose(p, y[-12:], atol=1e-12)


def test_ets_ana_seasonal_arm_hand_stepped():
    """ETS(A,N,A) arm (ets.rs:441-444, 862-865): period 2, fixed params,
    hand-stepped recurrences."""
    y = np.array([10.0, 20.0, 12.0, 22.0])
    st = s.ets_fit(y, "ANA", period=2, optimize=False, alpha=0.5, gamma=0.5)
    # init: level = mean(y[:2]) = 15; seasonals = y[:2]-15 = [-5, +5]
    # start at t=2: f = l + s0 = 15 + (-5) = 10
    # l = .5*(12-(-5)) + .5*15 = 16; s0' = .5*(12-16) + .5*(-5) = -4.5
    # t=3: f = 16 + 5 = 21
    # l = .5*(22-5) + .5*16 = 16.5; s1' = .5*(22-16.5) + .5*5 = 5.25
    assert st.fitted[:2].tolist() == [10.0, 20.0]  # warm-up = y
    assert st.fitted[2] == pytest.approx(10.0)
    assert st.fitted[3] == pytest.approx(21.0)
    assert st.level == pytest.approx(16.5)
    np.testing.assert_allclose(st.seasonals, [-4.5, 5.25])
    # predict: n=4 -> h=1 uses seasonals[(4+0) % 2] = s0' = -4.5
    pred = s.ets_predict(st, 2)
    np.testing.assert_allclose(pred, [16.5 - 4.5, 16.5 + 5.25])


def test_ets_multiplicative_arms_finite():
    rng = np.random.default_rng(40)
    t = np.arange(72)
    y = (20 + 0.3 * t) * (1 + 0.2 * np.sin(2 * np.pi * t / 12)) + rng.normal(0, 0.2, 72)
    for spec in ("MNN", "AAM", "MAM"):
        st = s.ets_fit(y, spec, period=12, optimize=False,
                       alpha=0.3, beta=0.05, gamma=0.1)
        pred = s.ets_predict(st, 12)
        assert np.isfinite(pred).all(), spec
        assert np.all(pred > 0), spec
