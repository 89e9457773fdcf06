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


# --- round-5: ML estimation + vectorized AR-only CSS -----------------------

def _simulate_arma(n, ar=(), ma=(), seed=0, sigma=1.0):
    rng = np.random.default_rng(seed)
    e = rng.normal(0.0, sigma, n + 100)
    y = np.zeros(n + 100)
    p, q = len(ar), len(ma)
    for t in range(max(p, q), n + 100):
        y[t] = e[t]
        for i in range(p):
            y[t] += ar[i] * y[t - 1 - i]
        for j in range(q):
            y[t] += ma[j] * e[t - 1 - j]
    return y[100:]


def test_css_ar_only_vectorization_bitwise():
    """The q=0 lag-matrix CSS must be BITWISE equal to the sequential
    recursion it replaces (optimizer goldens replay the scalar fold)."""
    from anofox_forecast_ray.kernels.arima import _css

    def css_scalar(diff, p, q, ar, ma, intercept):
        n = diff.size
        start = max(p, q)
        resid = [0.0] * n
        css = 0.0
        y = diff.tolist()
        for t in range(start, n):
            pred = intercept
            for i in range(p):
                pred += ar[i] * (y[t - 1 - i] - intercept)
            for j in range(q):
                pred += ma[j] * resid[t - 1 - j]
            e = y[t] - pred
            resid[t] = e
            css += e * e
        return css

    rng = np.random.default_rng(42)
    for p in (1, 2, 3):
        for trial in range(5):
            diff = rng.normal(2.0, 1.5, 200)
            ar = rng.uniform(-0.9, 0.9, p)
            c = float(rng.normal())
            got = _css(diff, p, 0, ar, np.zeros(0), c)
            want = css_scalar(diff, p, 0, ar, np.zeros(0), c)
            assert got == want, (p, trial, got, want)


def test_kalman_loglik_matches_exact_gaussian():
    """The Kalman concentrated filter, evaluated at FIXED parameters with
    sigma2=1 (non-concentrated form), must equal the exact multivariate
    normal log-density with the ARMA autocovariance matrix (psi-weight
    construction, truncated far into the geometric tail)."""
    from anofox_forecast_ray.kernels.arima import (
        _kalman_concentrated,
        psi_weights,
    )

    n = 60
    z = _simulate_arma(n, ar=(0.6,), ma=(0.3,), seed=5)
    z = z - z.mean()
    ar = np.array([0.6])
    ma = np.array([0.3])

    ll_c, sigma2, v, F, _ = _kalman_concentrated(z, ar, ma)
    # un-concentrate: ll(sigma2=1) = -0.5 * sum(log 2pi + log F + v^2/F)
    ll_kalman = -0.5 * float(
        np.sum(np.log(2 * np.pi) + np.log(F) + v * v / F)
    )

    K = 5000
    psi = psi_weights(ar, ma, d=0, horizon=K)
    # autocovariance gamma(k) = sum_j psi_j psi_{j+k} (sigma2 = 1)
    gamma = np.array(
        [float(np.dot(psi[: K - k], psi[k:])) for k in range(n)]
    )
    idx = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    Sigma = gamma[idx]
    sign, logdet = np.linalg.slogdet(Sigma)
    assert sign > 0
    alpha = np.linalg.solve(Sigma, z)
    ll_exact = -0.5 * (
        n * np.log(2 * np.pi) + logdet + float(z @ alpha)
    )
    assert abs(ll_kalman - ll_exact) < 1e-6, (ll_kalman, ll_exact)


def test_ml_recovers_ar1():
    from anofox_forecast_ray.kernels.arima import arima_fit, arima_fit_ml

    y = 5.0 + _simulate_arma(400, ar=(0.7,), seed=11)
    ml = arima_fit_ml(y, p=1, d=0, q=0)
    css = arima_fit(y, p=1, d=0, q=0)
    assert abs(ml.ar[0] - 0.7) < 0.1
    assert abs(ml.ar[0] - css.ar[0]) < 0.05
    assert ml.method == "ml"
    assert np.isfinite(ml.loglik)


def test_ml_css_aic_parity():
    """ML and CSS AICs on the same series/orders must be close (they
    differ only in the treatment of the first max(p,q) observations)."""
    from anofox_forecast_ray.kernels.arima import arima_fit, arima_fit_ml

    y = 10.0 + _simulate_arma(300, ar=(0.5,), ma=(-0.3,), seed=3)
    for (p, d, q) in ((1, 0, 1), (2, 0, 0), (1, 1, 1)):
        ml = arima_fit_ml(y, p=p, d=d, q=q)
        css = arima_fit(y, p=p, d=d, q=q)
        assert np.isfinite(ml.aic) and np.isfinite(css.aic)
        assert abs(ml.aic - css.aic) / abs(css.aic) < 0.05, (p, d, q)


def test_ml_predict_matches_css_direction():
    from anofox_forecast_ray.kernels.arima import (
        arima_fit,
        arima_fit_ml,
        arima_predict,
        arima_predict_ml,
    )

    y = 20.0 + np.cumsum(_simulate_arma(200, ar=(0.4,), seed=9))
    ml = arima_fit_ml(y, p=1, d=1, q=0)
    css = arima_fit(y, p=1, d=1, q=0)
    f_ml = arima_predict_ml(ml, 8)
    f_css = arima_predict(css, 8)
    assert f_ml.shape == (8,)
    assert np.all(np.isfinite(f_ml))
    # same integration anchor; forecasts must agree to a few percent of
    # the series scale
    scale = np.std(y)
    assert np.max(np.abs(f_ml - f_css)) < 0.25 * scale


# --- round-5: general-order GARCH(p,q) (garch.rs full config surface) ------

def _vol_series(n, seed=3):
    """GARCH(1,1)-style volatility-clustered zero-mean series."""
    rng = np.random.default_rng(seed)
    e = np.empty(n)
    s2 = 1.0
    for t in range(n):
        if t:
            s2 = 0.2 + 0.3 * e[t - 1] ** 2 + 0.5 * s2
        e[t] = rng.normal(0.0, np.sqrt(s2))
    return e


def test_garch_pq_recovers_11():
    from anofox_forecast_ray.kernels.garch import garch_fit_pq

    st = garch_fit_pq(_vol_series(600, seed=7), 1, 1)
    assert 0.05 < float(st.alpha[0]) < 0.6
    assert 0.2 < float(st.beta[0]) < 0.9
    assert float(st.alpha.sum() + st.beta.sum()) < 1.0
    assert np.isfinite(st.log_likelihood)


def test_garch_higher_order_reference_replica():
    """garch.rs tests::garch_higher_order: GARCH(2,2) on 150 points,
    10-step variance forecast, all finite/positive."""
    from anofox_forecast_ray.kernels.garch import (
        garch_fit_pq,
        garch_forecast_variance_pq,
    )

    st = garch_fit_pq(_vol_series(150), 2, 2)
    f = garch_forecast_variance_pq(st, 10)
    assert f.shape == (10,)
    assert np.isfinite(f).all() and (f > 0).all()


def test_garch_pq_sigma2_reference_semantics():
    """sigma^2 is computed from ORIGINAL x values with flipped
    coefficients and NaN warmup (garch.rs:173-220): entries
    1..max(p,q)-1 NaN, entry 0 = population variance, and the k=2 term
    of a (2,1) model must SKIP the NaN sigma2[1] beta contribution."""
    from anofox_forecast_ray.kernels.garch import garch_sigma2_pq

    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    omega, alpha, beta = 0.5, np.array([0.1, 0.2]), np.array([0.3])
    s = garch_sigma2_pq(x, omega, alpha, beta, 2, 1)
    var = float(np.var(x))
    assert s[0] == var
    assert np.isnan(s[1])
    # k=2: omega + a[1]*x[0]^2 + a[0]*x[1]^2, beta term skipped (NaN lag)
    assert s[2] == 0.5 + 0.2 * 1.0 + 0.1 * 4.0
    # k=3: beta now sees s[2]
    assert s[3] == 0.5 + 0.2 * 4.0 + 0.1 * 9.0 + 0.3 * s[2]


def test_garch_pq_unconditional_variance():
    from anofox_forecast_ray.kernels.garch import garch_fit_pq

    st = garch_fit_pq(_vol_series(400, seed=1), 1, 1)
    u = st.unconditional_variance()
    persist = float(st.alpha.sum() + st.beta.sum())
    assert u == st.omega / (1.0 - persist)
    # long-horizon variance forecast approaches it
    from anofox_forecast_ray.kernels.garch import (
        garch_forecast_variance_pq,
    )

    f = garch_forecast_variance_pq(st, 200)
    assert abs(f[-1] - u) < abs(f[0] - u) + 1e-12
