"""ARIMA / AutoARIMA / GARCH kernel tests."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.arima import (
    arima_fit,
    arima_predict,
    auto_arima_fit,
    difference,
    integrate,
    select_d,
)
from anofox_forecast_ray.kernels.garch import garch_fit, garch_forecast_variance


def test_difference_integrate_roundtrip():
    # diff.rs:209-217 fixture
    original = np.array([10.0, 12.0, 15.0, 19.0, 24.0])
    fdiff = np.array([6.0, 7.0])
    out = integrate(fdiff, original, 1)
    np.testing.assert_allclose(out, [30.0, 37.0], atol=1e-10)
    d2 = difference(original, 2)
    np.testing.assert_allclose(d2, [1.0, 1.0, 1.0])


def test_ar1_recovers_coefficient():
    rng = np.random.default_rng(0)
    n = 600
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 5.0 + 0.7 * (y[t - 1] - 5.0) + rng.normal(0, 1)
    st = arima_fit(y, p=1, d=0, q=0)
    assert st.ar[0] == pytest.approx(0.7, abs=0.08)
    assert st.intercept == pytest.approx(5.0, abs=0.5)
    pred = arima_predict(st, 3)
    # AR(1) forecast decays toward the intercept
    assert abs(pred[2] - 5.0) < abs(pred[0] - 5.0) + 1e-9


def test_arima_011_equals_driftless_smoothing():
    rng = np.random.default_rng(1)
    y = np.cumsum(rng.normal(0.5, 1.0, 300))
    st = arima_fit(y, p=0, d=1, q=1)
    pred = arima_predict(st, 5)
    assert np.isfinite(pred).all()
    # differenced intercept ~ drift 0.5 -> forecast slope ~0.5
    slopes = np.diff(pred)
    assert slopes.mean() == pytest.approx(0.5, abs=0.25)


def test_select_d():
    rng = np.random.default_rng(2)
    stationary = rng.normal(0, 1, 300)
    walk = np.cumsum(rng.normal(0, 1, 300))
    assert select_d(stationary) == 0
    assert select_d(walk) >= 1


def test_auto_arima_on_ar1():
    rng = np.random.default_rng(3)
    n = 300
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 0.8 * y[t - 1] + rng.normal(0, 1)
    st = auto_arima_fit(y, max_p=2, max_q=1)
    assert st.d == 0
    assert st.p >= 1  # AR structure found
    pred = arima_predict(st, 4)
    assert np.isfinite(pred).all()


def test_arima_intervals_widen():
    from anofox_forecast_ray.models import ARIMA

    rng = np.random.default_rng(4)
    y = np.cumsum(rng.normal(0, 1, 200))
    point, lo, hi = ARIMA(1, 1, 0).fit(y).predict_with_intervals(6)
    widths = hi - lo
    assert (np.diff(widths) >= -1e-9).all()  # non-decreasing


def test_garch_recovers_volatility_clustering():
    rng = np.random.default_rng(5)
    n = 1500
    e = np.zeros(n)
    s2 = np.zeros(n)
    s2[0] = 1.0
    omega, alpha, beta = 0.1, 0.15, 0.8
    for t in range(1, n):
        s2[t] = omega + alpha * e[t - 1] ** 2 + beta * s2[t - 1]
        e[t] = rng.normal(0, np.sqrt(s2[t]))
    st = garch_fit(e)
    assert st.alpha + st.beta == pytest.approx(alpha + beta, abs=0.12)
    v = garch_forecast_variance(st, 50)
    uncond = st.omega / (1 - st.alpha - st.beta)
    assert v[-1] == pytest.approx(uncond, rel=0.25)


def test_registry_arima_garch():
    from anofox_forecast_ray.models import make_model

    rng = np.random.default_rng(6)
    y = np.cumsum(rng.normal(0.1, 1, 120))
    for name in ("arima", "auto_arima", "garch"):
        m = make_model(name)
        p = m.fit(y).predict(3)
        assert p.shape == (3,) and np.isfinite(p).all(), name


def test_sarima_seasonal_structure():
    from anofox_forecast_ray.kernels.arima import (
        sarima_fit,
        sarima_predict,
        seasonal_difference,
    )

    # seasonal differencing fixture
    y = np.tile([1.0, 2.0, 3.0, 4.0], 5) + np.repeat(np.arange(5.0), 4)
    sd = seasonal_difference(y, 1, 4)
    np.testing.assert_allclose(sd, 1.0)

    rng = np.random.default_rng(8)
    t = np.arange(144)
    series = 20 + 10 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.5, 144)
    st = sarima_fit(series, p=1, d=0, q=0, P=1, D=1, Q=0, s=12)
    pred = sarima_predict(st, 12)
    want = 20 + 10 * np.sin(2 * np.pi * (144 + np.arange(12)) / 12)
    assert np.abs(pred - want).mean() < 2.0  # tracks the seasonal shape


def test_sarima_registry():
    from anofox_forecast_ray.models import make_model

    rng = np.random.default_rng(9)
    t = np.arange(96)
    y = 5 + 4 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.3, 96)
    m = make_model("sarima", p=0, d=0, q=0, P=1, D=1, Q=0, s=12)
    p = m.fit(y).predict(6)
    assert p.shape == (6,) and np.isfinite(p).all()


def test_auto_arima_stepwise_matches_grid_on_ar1():
    from anofox_forecast_ray.kernels.arima import auto_arima_fit

    rng = np.random.default_rng(11)
    n = 300
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 0.75 * y[t - 1] + rng.normal(0, 1)
    grid = auto_arima_fit(y, max_p=3, max_q=3, stepwise=False)
    step = auto_arima_fit(y, max_p=3, max_q=3, stepwise=True)
    # stepwise must land on a model whose AIC is close to the grid optimum
    assert step.aic <= grid.aic + 4.0
    assert step.d == grid.d == 0


def test_psi_weight_intervals():
    """Exact MA(inf) variance recursion: closed-form checks.

    - ARIMA(0,0,0): psi = [1,0,0,..] -> var_h = sigma^2 (flat)
    - ARIMA(0,1,0): random walk -> psi all 1 -> var_h = sigma^2 * h
      (equals the reference's simplified formula exactly)
    - AR(1): psi_j = phi^j -> var_h = sigma^2 * sum phi^(2j)
    """
    from anofox_forecast_ray.kernels.arima import psi_weights

    np.testing.assert_allclose(
        psi_weights([], [], 0, 4), [1.0, 0.0, 0.0, 0.0]
    )
    np.testing.assert_allclose(
        psi_weights([], [], 1, 5), np.ones(5)
    )
    phi = 0.6
    np.testing.assert_allclose(
        psi_weights([phi], [], 0, 5), phi ** np.arange(5)
    )
    # ARMA(1,1): psi_1 = theta + phi, psi_j = phi*psi_{j-1} for j>=2
    th = 0.3
    ps = psi_weights([phi], [th], 0, 4)
    np.testing.assert_allclose(
        ps, [1.0, th + phi, phi * (th + phi), phi**2 * (th + phi)]
    )


def test_arima_interval_methods_agree_on_random_walk():
    from anofox_forecast_ray.kernels.arima import arima_fit, arima_intervals

    rng = np.random.default_rng(3)
    y = np.cumsum(rng.normal(0, 1, 200)) + 50
    st = arima_fit(y, p=0, d=1, q=0)
    _, lo_ref, hi_ref = arima_intervals(st, 6, method="reference")
    _, lo_psi, hi_psi = arima_intervals(st, 6, method="psi")
    np.testing.assert_allclose(lo_ref, lo_psi)
    np.testing.assert_allclose(hi_ref, hi_psi)


def test_sarima_intervals_reference_widening():
    from anofox_forecast_ray.models import make_model

    rng = np.random.default_rng(5)
    i = np.arange(120, dtype=float)
    y = 50 + 5 * np.sin(2 * np.pi * i / 12) + rng.normal(0, 1, 120)
    m = make_model("sarima", p=1, d=0, q=0, P=1, D=0, Q=0, s=12).fit(y)
    p, lo, hi = m.predict_with_intervals(6, 0.95)
    width = hi - lo
    assert np.isfinite(width).all() and (width > 0).all()
    # var*(1+0.1h): widths grow like sqrt(1+0.1h)
    np.testing.assert_allclose(
        width / width[0],
        np.sqrt((1 + 0.1 * np.arange(1, 7)) / 1.1),
        rtol=1e-10,
    )
