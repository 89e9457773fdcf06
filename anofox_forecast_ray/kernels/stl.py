"""STL / MSTL seasonal-trend decomposition.

Reference semantics (src/seasonality/stl.rs:61-400, mstl.rs:82-200),
including its SIMPLIFIED LOESS (tricube-weighted local average, not local
regression — stl.rs:249-345) so components match the reference, not R's
stl():

- params per Cleveland et al. (1990) exactly as stl.rs:81-97 derives
  them: ns = period|1, nt = ceil(1.5*m / (1 - 1.5/m)) forced odd (from
  the RAW period — the reference computes nt before odd-forcing ns),
  nl = period forced odd
- inner loop (2 iters): detrend -> cycle-subseries LOESS -> low-pass
  (MA(m), MA(m), MA(3), LOESS nl) -> seasonal = smoothed - lowpass ->
  deseasonalize -> trend LOESS (nt)
- outer robustness loop: bisquare weights on remainders
- MSTL: iteratively STL per period (ascending), refining each seasonal
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


def _tricube_smooth(values: np.ndarray, span: int, weights: np.ndarray) -> np.ndarray:
    """Simplified LOESS: tricube-weighted windowed average (stl.rs:249-290)."""
    n = values.size
    if n == 0:
        return values.copy()
    half = span // 2
    out = np.empty(n)
    max_dist = half + 1.0
    # precompute tricube kernel for offsets -half..half
    offs = np.arange(-half, half + 1)
    kern = np.clip(1.0 - (np.abs(offs) / max_dist) ** 3, 0.0, None) ** 3
    for i in range(n):
        s = max(0, i - half)
        e = min(n, i + half + 1)
        k = kern[(s - i) + half : (e - i) + half]
        w = k * weights[s:e]
        sw = w.sum()
        out[i] = (w @ values[s:e]) / sw if sw > 0 else values[i]
    return out


def _centered_ma(series: np.ndarray, window: int) -> np.ndarray:
    """Edge-shrinking centered MA (stl.rs:307-321)."""
    n = series.size
    half = window // 2
    c = np.concatenate(([0.0], np.cumsum(series)))
    idx = np.arange(n)
    s = np.maximum(0, idx - half)
    e = np.minimum(n, idx + half + 1)
    return (c[e] - c[s]) / (e - s)


@dataclass
class STLResult:
    trend: np.ndarray
    seasonal: np.ndarray
    remainder: np.ndarray

    def seasonal_strength(self) -> float:
        # sample variance (n-1) + 1e-10 floor per stl.rs:22-37,477-484
        var_rs = _sample_var(self.remainder + self.seasonal)
        if var_rs < 1e-10:
            return 0.0
        return max(0.0, 1.0 - _sample_var(self.remainder) / var_rs)

    def trend_strength(self) -> float:
        var_rt = _sample_var(self.remainder + self.trend)
        if var_rt < 1e-10:
            return 0.0
        return max(0.0, 1.0 - _sample_var(self.remainder) / var_rt)


def _sample_var(x: np.ndarray) -> float:
    n = x.size
    if n < 2:
        return 0.0
    mean = float(x.sum()) / n
    d = x - mean
    return float(np.dot(d, d)) / (n - 1)


def stl_decompose(
    y: np.ndarray,
    period: int,
    seasonal_smoothness: int | None = None,
    trend_smoothness: int | None = None,
    inner_iterations: int = 2,
    outer_iterations: int = 0,
) -> STLResult | None:
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    m = period
    if n < 2 * m:
        return None
    ns = (seasonal_smoothness or m) | 1
    if trend_smoothness is None:
        # stl.rs:83-85: nt derives from the RAW period (the reference
        # computes it from ns BEFORE odd-forcing, i.e. ns == m) — for
        # even periods this differs from using ns|1 (m=4: nt=11 not 9).
        # m <= 1 makes the denominator non-positive; Rust's saturating
        # f64->usize cast maps that to 0, odd-forced to 1.
        nt = max(0, math.ceil(1.5 * m / (1.0 - 1.5 / m))) if m > 1 else 0
        nt = nt + 1 if nt % 2 == 0 else nt
    else:
        nt = trend_smoothness | 1
    nl = m if m % 2 == 1 else m + 1

    seasonal = np.zeros(n)
    trend = np.zeros(n)
    weights = np.ones(n)
    outer = max(1, outer_iterations) if outer_iterations > 0 else 1

    for _ in range(outer):
        for _ in range(inner_iterations):
            detrended = y - trend
            # cycle-subseries smoothing
            cycle = np.empty(n)
            for pos in range(m):
                idx = np.arange(pos, n, m)
                cycle[idx] = _tricube_smooth(detrended[idx], ns, weights[idx])
            # low-pass: MA(m), MA(m), MA(3), LOESS(nl)
            lp = _centered_ma(_centered_ma(_centered_ma(cycle, m), m), 3)
            lp = _tricube_smooth(lp, nl, np.ones(n))
            seasonal = cycle - lp
            deseason = y - seasonal
            trend = _tricube_smooth(deseason, nt, weights)
        if outer_iterations > 0:
            # bisquare on |r| / (6 * median|r|), all-ones below the
            # reference's 1e-10 floor (stl.rs:365-396)
            r = y - seasonal - trend
            h = 6.0 * np.median(np.abs(r))
            if h < 1e-10:
                weights = np.ones(n)
            else:
                u = np.abs(r) / h
                weights = np.where(u < 1.0, (1.0 - u * u) ** 2, 0.0)
    return STLResult(trend=trend, seasonal=seasonal, remainder=y - seasonal - trend)


def mstl_decompose(
    y: np.ndarray, periods: list[int], iterations: int = 2
):
    """MSTL: iterative per-period STL refinement (mstl.rs:82-200).

    Returns (trend, {period: seasonal}, remainder) or None if no period
    fits the series length.
    """
    y = np.asarray(y, dtype=np.float64)
    periods = sorted(p for p in periods if y.size >= 2 * p and p >= 2)
    if not periods:
        return None
    seasonals = {p: np.zeros(y.size) for p in periods}
    trend = np.zeros(y.size)
    for _ in range(iterations):
        for p in periods:
            partial = y - sum(
                seasonals[q] for q in periods if q != p
            )
            res = stl_decompose(partial, p)
            if res is None:
                continue
            seasonals[p] = res.seasonal
            trend = res.trend
    remainder = y - trend - sum(seasonals.values())
    return trend, seasonals, remainder
