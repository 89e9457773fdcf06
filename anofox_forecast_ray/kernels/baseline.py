"""Baseline forecasting kernels: Naive, SeasonalNaive, RandomWalkWithDrift,
moving-average family.

Semantics re-derived from the reference:
- Naive             src/models/baseline/naive.rs:92-240 (fitted=shift(1),
                    residuals=diff(1), flat forecast at last value,
                    se = sigma*sqrt(h))
- SeasonalNaive     src/models/baseline/seasonal_naive.rs:46-160
                    (fitted y[t-m] with NaN prefix; predict wraps the last
                    cycle; se = sigma*sqrt(completed seasons ahead))
- RandomWalkWithDrift src/models/baseline/random_walk.rs:33-120
                    (drift=(y[n-1]-y[0])/(n-1); yhat=last+h*drift;
                    se = sigma*sqrt(h))
- SMA / HistoricAverage / WindowAverage / SeasonalWindowAverage
                    src/models/baseline/sma.rs, seasonal_window.rs
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .stats import quantile_normal, residual_variance


@dataclass
class SimpleState:
    name: str
    forecast_fn: object     # callable(h)->np.ndarray
    fitted: np.ndarray
    residuals: np.ndarray
    variance: float
    n: int
    se_fn: object = None    # callable(h_array)->se multiplier array


def naive_fit(y: np.ndarray) -> SimpleState:
    y = np.asarray(y, dtype=np.float64)
    if y.size == 0:
        raise ValueError("empty series")
    fitted = np.empty_like(y)
    fitted[0] = np.nan
    fitted[1:] = y[:-1]
    residuals = y - fitted
    last = float(y[-1])
    var = residual_variance(residuals, skip=0)
    return SimpleState(
        "Naive",
        lambda h: np.full(h, last),
        fitted,
        residuals,
        var,
        y.size,
        se_fn=lambda h: np.sqrt(h),
    )


def seasonal_naive_fit(y: np.ndarray, period: int) -> SimpleState:
    y = np.asarray(y, dtype=np.float64)
    m = int(period)
    if y.size < m:
        raise ValueError(f"need >= {m} points, got {y.size}")
    fitted = np.full(y.size, np.nan)
    fitted[m:] = y[:-m]
    residuals = y - fitted
    n = y.size
    last_cycle = y[n - m :].copy()

    def forecast(h):
        idx = np.arange(h) % m
        return last_cycle[idx]

    var = residual_variance(residuals, skip=0)
    return SimpleState(
        "SeasonalNaive",
        forecast,
        fitted,
        residuals,
        var,
        n,
        # k = completed seasons ahead: (h0 // m) + 1 with h0 zero-based
        se_fn=lambda h: np.sqrt((h - 1) // m + 1.0),
    )


def rwd_fit(y: np.ndarray) -> SimpleState:
    y = np.asarray(y, dtype=np.float64)
    if y.size < 2:
        raise ValueError("need >= 2 points")
    n = y.size
    drift = float(y[-1] - y[0]) / (n - 1)
    fitted = np.full(n, np.nan)
    fitted[1:] = y[:-1] + drift
    residuals = y - fitted
    last = float(y[-1])
    var = residual_variance(residuals, skip=0)
    return SimpleState(
        "RandomWalkWithDrift",
        lambda h: last + drift * np.arange(1, h + 1),
        fitted,
        residuals,
        var,
        n,
        se_fn=lambda h: np.sqrt(h),
    )


def sma_fit(y: np.ndarray, window: int) -> SimpleState:
    """SimpleMovingAverage (sma.rs:17-290): flat forecast at the mean of the
    last ``window`` values; fitted[t] = mean of previous window."""
    y = np.asarray(y, dtype=np.float64)
    w = int(window)
    if y.size < w:
        raise ValueError(f"need >= {w} points")
    c = np.concatenate(([0.0], np.cumsum(y)))
    fitted = np.full(y.size, np.nan)
    if y.size > w:
        fitted[w:] = (c[w:-1] - c[:-w-1]) / w
    residuals = y - fitted
    level = float((c[-1] - c[-1 - w]) / w)
    return SimpleState(
        "SimpleMovingAverage",
        lambda h: np.full(h, level),
        fitted,
        residuals,
        residual_variance(residuals, skip=0),
        y.size,
        se_fn=lambda h: np.sqrt(h),
    )


def historic_average_fit(y: np.ndarray) -> SimpleState:
    """HistoricAverage (sma.rs:296-370): flat forecast at the global mean;
    fitted[t] = expanding mean of y[:t] (first NaN)."""
    y = np.asarray(y, dtype=np.float64)
    if y.size == 0:
        raise ValueError("empty series")
    c = np.cumsum(y)
    fitted = np.full(y.size, np.nan)
    if y.size > 1:
        fitted[1:] = c[:-1] / np.arange(1, y.size)
    residuals = y - fitted
    mean = float(c[-1] / y.size)
    return SimpleState(
        "HistoricAverage",
        lambda h: np.full(h, mean),
        fitted,
        residuals,
        residual_variance(residuals, skip=0),
        y.size,
        se_fn=lambda h: np.sqrt(h),
    )


def window_average_fit(y: np.ndarray, window: int) -> SimpleState:
    """WindowAverage (sma.rs:373-): statsforecast-style — flat forecast at
    the mean of the last ``window`` values, no fitted path."""
    y = np.asarray(y, dtype=np.float64)
    w = int(window)
    if y.size < w:
        raise ValueError(f"need >= {w} points")
    level = float(y[-w:].mean())
    fitted = np.full(y.size, np.nan)
    residuals = np.full(y.size, np.nan)
    return SimpleState(
        "WindowAverage",
        lambda h: np.full(h, level),
        fitted,
        residuals,
        0.0,
        y.size,
        se_fn=lambda h: np.sqrt(h),
    )


def seasonal_window_average_fit(
    y: np.ndarray, period: int, window: int
) -> SimpleState:
    """SeasonalWindowAverage (seasonal_window.rs:14-120): forecast for
    season s = mean of the last ``window`` observations in that season."""
    y = np.asarray(y, dtype=np.float64)
    m, w = int(period), int(window)
    if y.size < m * w:
        raise ValueError(f"need >= {m*w} points")
    n = y.size
    season_means = np.empty(m)
    for s in range(m):
        vals = y[s::m] if s < n else np.zeros(0)
        season_means[s] = vals[-w:].mean() if vals.size else np.nan
    # align to the season of the next step: position n has season n % m
    def forecast(h):
        idx = (n + np.arange(h)) % m
        return season_means[idx]

    fitted = np.full(n, np.nan)
    residuals = np.full(n, np.nan)
    return SimpleState(
        "SeasonalWindowAverage", forecast, fitted, residuals, 0.0, n,
        se_fn=lambda h: np.sqrt(h),
    )


def simple_intervals(state: SimpleState, horizon: int, level: float = 0.95):
    z = quantile_normal((1.0 + level) / 2.0)
    point = state.forecast_fn(horizon)
    h = np.arange(1, horizon + 1, dtype=np.float64)
    mult = state.se_fn(h) if state.se_fn is not None else np.sqrt(h)
    se = np.sqrt(state.variance) * mult
    return point, point - z * se, point + z * se
