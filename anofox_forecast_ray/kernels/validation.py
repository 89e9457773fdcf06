"""Residual / stationarity diagnostics.

Reference semantics:
- ljung_box     src/validation/residual_tests.rs:37-95 (Q = n(n+2) *
                sum acf_k^2/(n-k); df = lags - fitted_params, min 1;
                p-value = chi2 survival)
- box_pierce    residual_tests.rs:180-230 (Q = n * sum acf_k^2)
- durbin_watson residual_tests.rs:131-175 (sum diff^2 / sum r^2)
- kpss_test     src/validation/stationarity.rs:285-380 (level-stationarity
                eta = sum S_t^2 / (n^2 * lrv), Bartlett long-run variance)
- adf wrapper   -> kernels.features.augmented_dickey_fuller

chi-squared survival implemented via the regularized incomplete gamma
(series + continued fraction — Numerical Recipes formulas, public).
"""

from __future__ import annotations

import math

import numpy as np

from .features import acf as _acf
from .features import augmented_dickey_fuller  # noqa: F401  (re-export)


def _gammainc_upper_reg(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x)."""
    if x < 0 or a <= 0:
        return float("nan")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # series for P(a,x)
        term = 1.0 / a
        total = term
        aa = a
        for _ in range(500):
            aa += 1.0
            term *= x / aa
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        p = total * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, min(1.0, 1.0 - p))
    # continued fraction for Q(a,x)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = h * math.exp(-x + a * math.log(x) - math.lgamma(a))
    return max(0.0, min(1.0, q))


def chi2_sf(x: float, df: int) -> float:
    return _gammainc_upper_reg(df / 2.0, x / 2.0)


def ljung_box(residuals, lags: int | None = None, fitted_params: int = 0):
    r = np.asarray(residuals, dtype=np.float64)
    n = r.size
    if n < 3:
        return {"statistic": float("nan"), "p_value": float("nan"),
                "lags": 0, "df": 0}
    if lags is None:
        lags = max(min(10, n // 5), 1)
    lags = min(lags, n - 1)
    rho = _acf(r, lags)
    k = np.arange(1, lags + 1)
    # sequential fold over lag terms (SQL-oracle replayable)
    q = float(n * (n + 2) * np.cumsum(rho[1:] ** 2 / (n - k))[-1])
    df = max(lags - fitted_params, 1)
    return {"statistic": q, "p_value": chi2_sf(q, df), "lags": lags, "df": df}


def box_pierce(residuals, lags: int | None = None, fitted_params: int = 0):
    r = np.asarray(residuals, dtype=np.float64)
    n = r.size
    if n < 3:
        return {"statistic": float("nan"), "p_value": float("nan"),
                "lags": 0, "df": 0}
    if lags is None:
        lags = max(min(10, n // 5), 1)
    lags = min(lags, n - 1)
    rho = _acf(r, lags)
    q = float(n * np.cumsum(rho[1:] ** 2)[-1])
    df = max(lags - fitted_params, 1)
    return {"statistic": q, "p_value": chi2_sf(q, df), "lags": lags, "df": df}


def durbin_watson(residuals) -> float:
    # cumsum left folds (not np.dot): the DW SQL oracle replays both sums
    # with list_reduce
    r = np.asarray(residuals, dtype=np.float64)
    if r.size < 2:
        return float("nan")
    denom = float(np.cumsum(r * r)[-1])
    if denom == 0:
        return float("nan")
    d = np.diff(r)
    return float(np.cumsum(d * d)[-1] / denom)


def kpss_test(y, lags: int | None = None):
    """KPSS level-stationarity statistic + rough p-value bucket.

    eta = sum_t S_t^2 / (n^2 * lrv); lrv = Bartlett-kernel long-run
    variance. Critical values (level case): 10%: 0.347, 5%: 0.463,
    2.5%: 0.574, 1%: 0.739.
    """
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 10:
        return {"statistic": float("nan"), "p_value": float("nan")}
    # sequential folds throughout (SQL-oracle replayable, CLAUDE.md)
    e = y - float(np.cumsum(y)[-1]) / n
    s = np.cumsum(e)
    if lags is None:
        lags = int(4 * (n / 100.0) ** 0.25)
    lrv = float(np.cumsum(e * e)[-1]) / n
    for k in range(1, lags + 1):
        w = 1.0 - k / (lags + 1.0)
        lrv += 2.0 * w * float(np.cumsum(e[:-k] * e[k:])[-1]) / n
    lrv = max(lrv, 1e-12)
    eta = float(np.cumsum(s * s)[-1]) / (n * n * lrv)
    return {"statistic": eta, "p_value": kpss_p_value(eta), "lags": lags}


def kpss_p_value(stat: float) -> float:
    """Reference's piecewise-linear KPSS p-value approximation
    (stationarity.rs:366-381), spelled identically so the SQL oracle
    replays it bitwise."""
    if math.isnan(stat):
        return float("nan")
    if stat < 0.347:
        return 0.10 + 0.90 * (1.0 - stat / 0.347)
    if stat < 0.463:
        return 0.05 + 0.05 * (0.463 - stat) / (0.463 - 0.347)
    if stat < 0.739:
        return 0.01 + 0.04 * (0.739 - stat) / (0.739 - 0.463)
    return 0.01 * (1.0 - min(stat - 0.739, 1.0))


def adf_p_value(t: float) -> float:
    """Reference's bucketed MacKinnon-style ADF p-value map
    (stationarity.rs:240-272, constant-only tau_c)."""
    if math.isnan(t):
        return float("nan")
    if t < -4.0:
        return 0.001
    if t < -3.43:
        return 0.01
    if t < -2.86:
        return 0.05
    if t < -2.57:
        return 0.10
    if t < -1.94:
        return 0.20
    if t < -1.62:
        return 0.30
    if t < -1.28:
        return 0.40
    if t < -0.84:
        return 0.50
    if t < 0.0:
        return 0.70
    return 0.90 + 0.05 * (1.0 - math.exp(-t))


def adf_test(y, max_lag: int | None = None) -> dict:
    """ADF with MacKinnon asymptotic critical values (constant-only case:
    1%: -3.43, 5%: -2.86, 10%: -2.57) and the reference's exact
    MacKinnon-style p-value map (stationarity.rs:42-280)."""
    t = augmented_dickey_fuller(np.asarray(y, dtype=np.float64), max_lag)
    crits = {"1%": -3.43, "5%": -2.86, "10%": -2.57}
    p = adf_p_value(t)
    return {
        "statistic": t,
        "p_value": p,
        "critical_values": crits,
        "stationary": (t < crits["5%"]) if not math.isnan(t) else False,
    }


def test_stationarity(y) -> dict:
    """Combined ADF + KPSS verdict (stationarity.rs:391-450)."""
    adf = adf_test(y)
    adf_t = adf["statistic"]
    kpss = kpss_test(y)
    adf_stationary = adf["stationary"]
    kpss_stationary = kpss["statistic"] < 0.463 if not math.isnan(kpss["statistic"]) else False
    if adf_stationary and kpss_stationary:
        conclusion = "stationary"
    elif not adf_stationary and not kpss_stationary:
        conclusion = "non_stationary"
    else:
        conclusion = "inconclusive"
    return {
        "adf_statistic": adf_t,
        "kpss_statistic": kpss["statistic"],
        "adf_stationary": adf_stationary,
        "kpss_stationary": kpss_stationary,
        "stationary": adf_stationary and kpss_stationary,
        "conclusion": conclusion,
    }
