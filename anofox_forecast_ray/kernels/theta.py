"""Standard Theta Model (STM, Fiorucci et al. 2016) kernel.

Semantics re-derived from src/models/theta/model.rs (NOT ported):
- ACF-based seasonal test (:495-548): decompose only when period>=4,
  n>=2*period, and |r_m|/stat > z_95 with
  stat = sqrt((1 + 2*sum(r[:-1]^2))/n).
- Classical decomposition (:301-397): centered MA trend (weighted endpoints
  for even periods), season-averaged + normalized indices; multiplicative
  -> additive fallbacks when data non-positive or any seasonal factor <
  0.01 (:426-451).
- Fit (:631-773): OLS slope b on the 0-indexed deseasonalized series; SES
  scan with alpha (default fixed 0.1) on the deseasonalized series; fitted
  values reseasonalized; residual variance over residuals[1:].
- Predict (:599-620): yhat(h) = level + (1-1/theta)*b*(1/alpha + h - 1),
  reseasonalized by the last cycle starting at index 0.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead
from .smoothing import ses_scan, ses_sse
from .stats import quantile_normal, residual_variance

Z_95 = 1.6448536269514722  # norm.ppf(0.95)


def acf(y: np.ndarray, nlags: int) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    mean = y.mean()
    d = y - mean
    var = float(np.dot(d, d)) / n
    if var < 1e-10:
        return np.ones(nlags + 1)
    out = np.empty(nlags + 1)
    out[0] = 1.0
    for lag in range(1, nlags + 1):
        if lag >= n:
            out[lag] = 0.0
        else:
            out[lag] = float(np.dot(d[:-lag], d[lag:])) / (n * var)
    return out


def seasonal_test(y: np.ndarray, period: int) -> bool:
    if period < 4 or y.size < 2 * period:
        return False
    r = acf(y, period)[1:]
    stat = np.sqrt((1.0 + 2.0 * float(np.dot(r[:-1], r[:-1]))) / y.size)
    return abs(r[-1]) / stat > Z_95


def classical_seasonal_component(y: np.ndarray, period: int, multiplicative: bool):
    """Returns (full_seasonal, last_cycle); empty arrays when not computable."""
    n = y.size
    m = period
    if m == 0 or n < 2 * m:
        return np.zeros(0), np.zeros(0)
    half = m // 2
    trend = np.full(n, np.nan)
    c = np.concatenate(([0.0], np.cumsum(y)))
    for i in range(half, n - half):
        if m % 2 == 0:
            s = 0.5 * y[i - half] + 0.5 * y[i + half] + (c[i + half] - c[i - half + 1])
            trend[i] = s / m
        else:
            trend[i] = (c[i + half + 1] - c[i - half]) / m
    if multiplicative:
        with np.errstate(invalid="ignore", divide="ignore"):
            detrended = np.where(
                np.isnan(trend) | (np.abs(trend) < 1e-10), np.nan, y / trend
            )
    else:
        detrended = np.where(np.isnan(trend), np.nan, y - trend)
    idx = np.arange(n) % m
    seasonal = np.zeros(m)
    counts = np.zeros(m)
    valid = ~np.isnan(detrended)
    np.add.at(seasonal, idx[valid], detrended[valid])
    np.add.at(counts, idx[valid], 1.0)
    nz = counts > 0
    seasonal[nz] /= counts[nz]
    if multiplicative:
        mean = seasonal.mean()
        if abs(mean) > 1e-10:
            seasonal /= mean
    else:
        seasonal -= seasonal.mean()
    full = seasonal[idx]
    last_cycle = full[n - m :].copy()
    return full, last_cycle


@dataclass
class ThetaState:
    theta: float
    alpha: float
    b: float
    level: float
    multiplicative: bool
    seasonal_forecast: np.ndarray  # empty if non-seasonal
    fitted: np.ndarray
    residuals: np.ndarray
    variance: float
    n: int


def theta_optimize_alpha(y: np.ndarray) -> float:
    cfg = NelderMeadConfig(max_iter=500, tolerance=1e-8)
    res = nelder_mead(lambda p: ses_sse(y, p[0]), [0.5], [(0.0001, 0.9999)], cfg)
    return float(np.clip(res.optimal_point[0], 0.0001, 0.9999))


def theta_fit(
    y: np.ndarray,
    period: int = 0,
    theta: float = 2.0,
    alpha: float | None = 0.1,
    multiplicative: bool = True,
) -> ThetaState:
    y = np.asarray(y, dtype=np.float64)
    if y.size < 4:
        raise ValueError("need >= 4 points")
    n = y.size

    should_decompose = (
        period >= 4 and n >= 2 * period and seasonal_test(y, period)
    )
    eff_mult = multiplicative
    if should_decompose and multiplicative:
        if (y <= 0.0).any():
            eff_mult = False
        else:
            _, lc = classical_seasonal_component(y, period, True)
            if lc.size and (lc < 0.01).any():
                eff_mult = False
    if should_decompose:
        full_seasonal, seasonal_forecast = classical_seasonal_component(
            y, period, eff_mult
        )
    else:
        full_seasonal, seasonal_forecast = np.zeros(0), np.zeros(0)

    if full_seasonal.size:
        deseason = y / full_seasonal if eff_mult else y - full_seasonal
    else:
        deseason = y.copy()

    # OLS slope on 0-indexed x (model.rs:680-694). Sums are SEQUENTIAL
    # left folds (cumsum), not numpy pairwise: the driver oracle computes
    # the identical fold via DuckDB list_reduce, and float addition is
    # order-sensitive — this keeps the forecast bitwise-stable.
    x = np.arange(n, dtype=np.float64)
    x_mean = (n - 1) / 2.0
    y_mean = float(np.cumsum(deseason)[-1]) / n
    ss_xx = float(np.cumsum((x - x_mean) ** 2)[-1])
    ss_xy = float(np.cumsum((x - x_mean) * (deseason - y_mean))[-1])
    b = ss_xy / ss_xx if ss_xx > 0 else 0.0

    if alpha is None:
        alpha = theta_optimize_alpha(deseason)
    alpha = float(np.clip(alpha, 0.0001, 0.9999))

    levels = ses_scan(deseason, alpha)
    fitted_deseason = np.empty(n)
    fitted_deseason[0] = deseason[0]
    fitted_deseason[1:] = levels[:-1]
    if full_seasonal.size:
        fitted = (
            fitted_deseason * full_seasonal
            if eff_mult
            else fitted_deseason + full_seasonal
        )
    else:
        fitted = fitted_deseason
    residuals = np.empty(n)
    residuals[0] = 0.0
    residuals[1:] = y[1:] - fitted[1:]

    return ThetaState(
        theta=theta,
        alpha=alpha,
        b=b,
        level=float(levels[-1]),
        multiplicative=eff_mult,
        seasonal_forecast=seasonal_forecast,
        fitted=fitted,
        residuals=residuals,
        variance=residual_variance(residuals, skip=1),
        n=n,
    )


def theta_predict(state: ThetaState, horizon: int) -> np.ndarray:
    h = np.arange(1, horizon + 1, dtype=np.float64)
    point = state.level + (1.0 - 1.0 / state.theta) * state.b * (
        1.0 / state.alpha + h - 1.0
    )
    if state.seasonal_forecast.size:
        m = state.seasonal_forecast.size
        s = state.seasonal_forecast[np.arange(horizon) % m]
        point = point * s if state.multiplicative else point + s
    return point


def theta_intervals(state: ThetaState, horizon: int, level: float = 0.95):
    """SES-style variance widening factor 1 + b^2(1-b^(2(h-1)))/(1-b^2)
    with b = 1 - alpha (theta/model.rs:849-880)."""
    z = quantile_normal((1.0 + level) / 2.0)
    point = theta_predict(state, horizon)
    beta = 1.0 - state.alpha
    beta2 = beta * beta
    h = np.arange(1, horizon + 1, dtype=np.float64)
    if abs(1.0 - beta2) < 1e-12:
        factor = h.copy()
    else:
        factor = 1.0 + beta2 * (1.0 - beta2 ** (h - 1)) / (1.0 - beta2)
    factor[0] = 1.0
    se = np.sqrt(state.variance * factor)
    return point, point - z * se, point + z * se
