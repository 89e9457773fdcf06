"""Exogenous-regressor threading: OLS adjustment inside the model fit,
future-regressor validation, and parity against the reference's own
vendored exog fixtures.

Port of tests/exog_integration.rs (same generator: weekly sine + linear
trend regressors, wrapping-mul deterministic noise) and the fixture files
under tests/reference/*.json (vendored conformance data).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from anofox_forecast_ray.models import make_model

FIX = os.path.join(os.path.dirname(__file__), "reference_exog")


def generate_exog_test_data(n: int):
    """tests/exog_integration.rs:24-58 — deterministic AR(0.6) noise on
    beta0 + beta1*sin(2*pi*i/7) + beta2*(i/n)."""
    beta0, beta1, beta2, ar_coef = 50.0, 5.0, 10.0, 0.6
    seed = 42
    y, x1, x2 = [], [], []
    ar = 0.0
    for i in range(n):
        x1v = math.sin(2.0 * math.pi * i / 7.0)
        x2v = i / n
        noise = (((seed * (i + 1)) % (1 << 64)) % 1000 - 500.0) / 500.0
        ar = ar_coef * ar + noise
        x1.append(x1v)
        x2.append(x2v)
        y.append(beta0 + beta1 * x1v + beta2 * x2v + ar)
    return np.array(y), np.array(x1), np.array(x2)


def future_regressors(start: int, horizon: int, n: int):
    return {
        "x1": np.array(
            [math.sin(2.0 * math.pi * i / 7.0)
             for i in range(start, start + horizon)]
        ),
        "x2": np.array([i / n for i in range(start, start + horizon)]),
    }


@pytest.mark.parametrize("name,kw", [
    ("naive", {}),
    ("arima", {"p": 1, "d": 0, "q": 1}),
    ("auto_arima", {}),
    ("mfles", {}),
])
def test_exog_basic(name, kw):
    n, horizon = 100, 10
    y, x1, x2 = generate_exog_test_data(n)
    m = make_model(name, **kw)
    assert m.supports_exog()
    m.fit_with_exog(y, {"x1": x1, "x2": x2})
    assert m.has_exog()
    assert m.exog_names() == ["x1", "x2"]
    # plain exog predict without futures errors (naive.rs:44-50)
    with pytest.raises(ValueError):
        m.predict_with_exog(horizon)
    fc = m.predict_with_exog(horizon, future_regressors(n, horizon, n))
    assert fc.shape == (horizon,)
    assert np.isfinite(fc).all()


def test_without_exog_still_works():
    n, horizon = 100, 10
    y, _, _ = generate_exog_test_data(n)
    m = make_model("arima", p=1, d=0, q=1)
    assert m.supports_exog()
    m.fit(y)
    assert not m.has_exog()
    assert m.exog_names() is None
    fc = m.predict_with_exog(horizon)
    assert fc.shape == (horizon,) and np.isfinite(fc).all()


def test_missing_future_regressor_errors():
    n = 100
    y, x1, x2 = generate_exog_test_data(n)
    m = make_model("naive").fit_with_exog(y, {"x1": x1, "x2": x2})
    with pytest.raises(ValueError, match="missing future"):
        m.predict_with_exog(5, {"x1": np.zeros(5)})


def test_wrong_regressor_length_errors():
    n = 100
    y, x1, x2 = generate_exog_test_data(n)
    m = make_model("naive").fit_with_exog(y, {"x1": x1, "x2": x2})
    with pytest.raises(ValueError, match="expected 5"):
        m.predict_with_exog(5, {"x1": np.zeros(3), "x2": np.zeros(5)})
    with pytest.raises(ValueError, match="length"):
        make_model("naive").fit_with_exog(y, {"x1": x1[:50], "x2": x2})


def test_exog_unsupported_model_raises():
    y, x1, _ = generate_exog_test_data(50)
    with pytest.raises(ValueError, match="does not support"):
        make_model("ses").fit_with_exog(y, {"x1": x1})


def test_exog_intervals_work():
    n, horizon = 100, 10
    y, x1, x2 = generate_exog_test_data(n)
    m = make_model("naive").fit_with_exog(y, {"x1": x1, "x2": x2})
    p, lo, hi = m.predict_with_exog_intervals(
        horizon, future_regressors(n, horizon, n)
    )
    assert np.isfinite(p).all()
    assert (lo <= p).all() and (p <= hi).all()


def _load_fixture(name):
    with open(os.path.join(FIX, name)) as f:
        return json.load(f)


def _mape(actual, predicted):
    a, p = np.asarray(actual), np.asarray(predicted)
    return float(np.mean(np.abs((a - p) / a))) * 100.0


def test_naive_exog_closed_form():
    """Naive+OLS is closed-form: forecast = last adjusted value + future
    OLS contribution, verified against an explicit normal-equation solve."""
    data = _load_fixture("test_data_exog.json")
    ref = _load_fixture("naive_exog_reference.json")
    y = np.array(data["y"])
    x1, x2 = np.array(data["x1"]), np.array(data["x2"])
    m = make_model("naive").fit_with_exog(y, {"x1": x1, "x2": x2})
    fx1 = np.array(ref["future_x1"])
    fx2 = np.array(ref["future_x2"])
    fc = m.predict_with_exog(ref["horizon"], {"x1": fx1, "x2": fx2})
    # explicit normal equations
    X = np.column_stack([np.ones(y.size), x1, x2])
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    adjusted_last = y[-1] - (X[-1] @ beta)
    want = adjusted_last + beta[0] + beta[1] * fx1 + beta[2] * fx2
    np.testing.assert_allclose(fc, want, rtol=1e-8)


@pytest.mark.parametrize("fixture,name,kw,mape_pct", [
    # thresholds from the reference's own nixtla validation
    # (tests/nixtla_validation.rs:136-173): AutoARIMA < 15%, MFLES < 10%
    ("arima_exog_reference.json", "auto_arima", {}, 15.0),
    ("mfles_exog_reference.json", "mfles", {}, 10.0),
])
def test_exog_mape_vs_nixtla(fixture, name, kw, mape_pct):
    data = _load_fixture("test_data_exog.json")
    ref = _load_fixture(fixture)
    y = np.array(data["y"])
    m = make_model(name, **kw).fit_with_exog(
        y, {"x1": np.array(data["x1"]), "x2": np.array(data["x2"])}
    )
    fc = m.predict_with_exog(
        ref["horizon"],
        {"x1": np.array(ref["future_x1"]), "x2": np.array(ref["future_x2"])},
    )
    assert _mape(ref["forecast"], fc) < mape_pct


def test_coefficient_recovery_pure_regression():
    """ARIMA(0,0,0) with exog is pure regression
    (tests/nixtla_validation.rs:185-203)."""
    data = _load_fixture("test_data_exog.json")
    y = np.array(data["y"])
    m = make_model("arima", p=0, d=0, q=0).fit_with_exog(
        y, {"x1": np.array(data["x1"]), "x2": np.array(data["x2"])}
    )
    assert m.has_exog()
    assert len(m.exog_names()) == 2
    # ballpark recovery of the true coefficients (AR noise blurs them)
    ols = m._exog_ols
    assert abs(ols.intercept - 50.0) < 5.0
    assert abs(ols.coefficients[0] - 5.0) < 2.0
    assert abs(ols.coefficients[1] - 10.0) < 5.0


def test_forecast_direction_matches_nixtla():
    """>= 60% of step directions agree with the nixtla AutoARIMA forecast
    (tests/nixtla_validation.rs:206-244)."""
    data = _load_fixture("test_data_exog.json")
    ref = _load_fixture("arima_exog_reference.json")
    y = np.array(data["y"])
    m = make_model("auto_arima").fit_with_exog(
        y, {"x1": np.array(data["x1"]), "x2": np.array(data["x2"])}
    )
    fc = m.predict_with_exog(
        ref["horizon"],
        {"x1": np.array(ref["future_x1"]), "x2": np.array(ref["future_x2"])},
    )
    want = np.array(ref["forecast"])
    matches = sum(
        (want[i] > want[i - 1]) == (fc[i] > fc[i - 1])
        for i in range(1, ref["horizon"])
    )
    assert matches / (ref["horizon"] - 1) >= 0.6
