"""Intermittent-demand kernels: Croston (Classic / SBA / SBA-opt), TSB, ADIDA.

Semantics re-derived from the reference:
- Croston  src/models/intermittent/croston.rs:24-340 — demands = y[y>0];
  intervals = zeros-since-last-nonzero + 1 per demand; SES (l0=first) on
  each; flat forecast demand_level/max(interval_level,0.001), SBA factor
  (1 - alpha/2); alpha default 0.1; SBA-opt minimizes pooled one-step MSE
  via Nelder-Mead (start 0.1, bounds [0.01,0.99], tol 1e-4).
- TSB      src/models/intermittent/tsb.rs:18-200 — SES on demand sizes x
  SES on the 0/1 occurrence series; forecast = prob_level * size_level.
- ADIDA    src/models/intermittent/adida.rs:12-260 — aggregate into
  buckets of the mean inter-demand interval, SES-auto on bucket sums,
  disaggregate by bucket size.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead
from .smoothing import ses_scan
from .stats import quantile_normal


def demands_intervals(y: np.ndarray):
    y = np.asarray(y, dtype=np.float64)
    pos = y > 0.0
    demands = y[pos]
    nz = np.flatnonzero(pos)
    if nz.size == 0:
        return demands, np.zeros(0)
    intervals = np.empty(nz.size)
    intervals[0] = nz[0] + 1
    intervals[1:] = np.diff(nz)
    return demands, intervals


def _ses_final_level(v: np.ndarray, alpha: float) -> float:
    if v.size == 0:
        return 1.0
    return float(ses_scan(v, alpha)[-1])


def _croston_mse(y: np.ndarray, alpha: float) -> float:
    demands, intervals = demands_intervals(y)
    if demands.size < 2 or intervals.size == 0:
        return np.inf
    dl = ses_scan(demands, alpha)
    de = demands[1:] - dl[:-1]
    il = ses_scan(intervals, alpha)
    ie = intervals[1:] - il[:-1]
    return (float(np.dot(de, de)) + float(np.dot(ie, ie))) / (
        demands.size + intervals.size - 2
    )


@dataclass
class CrostonState:
    variant: str  # "classic" | "sba" | "sba_opt"
    alpha: float
    demand_level: float
    interval_level: float
    fitted: np.ndarray
    residuals: np.ndarray
    variance: float
    n: int

    @property
    def point(self) -> float:
        base = self.demand_level / max(self.interval_level, 0.001)
        if self.variant in ("sba", "sba_opt"):
            return base * (1.0 - self.alpha / 2.0)
        return base


def croston_fit(y: np.ndarray, variant: str = "classic", alpha: float = 0.1):
    y = np.asarray(y, dtype=np.float64)
    if y.size < 4:
        raise ValueError("need >= 4 points")
    demands, intervals = demands_intervals(y)
    if demands.size < 2:
        raise ValueError("need >= 2 demand occurrences")
    if variant == "sba_opt":
        cfg = NelderMeadConfig(tolerance=1e-4)
        res = nelder_mead(
            lambda p: np.inf
            if (p[0] <= 0.01 or p[0] >= 0.99)
            else _croston_mse(y, p[0]),
            [0.1],
            [(0.01, 0.99)],
            cfg,
        )
        alpha = float(np.clip(res.optimal_point[0], 0.01, 0.99))

    demand_level = _ses_final_level(demands, alpha)
    interval_level = _ses_final_level(intervals, alpha)

    # fitted path (croston.rs:196-240): forecast before updating at demands
    n = y.size
    fitted = np.zeros(n)
    dl = float(demands[0])
    il = float(intervals[0]) if intervals.size else 1.0
    sba = variant in ("sba", "sba_opt")
    demand_idx = 0
    since = 0
    for i in range(n):
        base = dl / max(il, 0.001)
        fitted[i] = base * (1.0 - alpha / 2.0) if sba else base
        if y[i] > 0.0:
            if demand_idx > 0:
                dl = alpha * y[i] + (1.0 - alpha) * dl
                il = alpha * since + (1.0 - alpha) * il
            demand_idx += 1
            since = 0
        since += 1
    residuals = y - fitted
    rm = residuals.mean()
    variance = float(np.mean((residuals - rm) ** 2)) if n > 1 else 0.0
    return CrostonState(
        variant, alpha, demand_level, interval_level, fitted, residuals,
        variance, n,
    )


def croston_predict(state: CrostonState, horizon: int) -> np.ndarray:
    return np.full(horizon, state.point)


def croston_intervals(state: CrostonState, horizon: int, level: float = 0.95):
    z = quantile_normal((1.0 + level) / 2.0)
    point = croston_predict(state, horizon)
    se = np.sqrt(state.variance)
    return point, point - z * se, point + z * se


@dataclass
class TSBState:
    alpha_d: float
    alpha_p: float
    demand_level: float
    prob_level: float
    n: int

    @property
    def point(self) -> float:
        return self.prob_level * self.demand_level


def tsb_fit(y: np.ndarray, alpha_d: float = 0.1, alpha_p: float = 0.1) -> TSBState:
    """TSB: SES over demand sizes at demand points; SES over the full 0/1
    occurrence indicator (tsb.rs:18-160)."""
    y = np.asarray(y, dtype=np.float64)
    if y.size < 4:
        raise ValueError("need >= 4 points")
    pos = y > 0.0
    demands = y[pos]
    if demands.size < 1:
        raise ValueError("need demand occurrences")
    demand_level = _ses_final_level(demands, alpha_d)
    prob_level = _ses_final_level(pos.astype(np.float64), alpha_p)
    return TSBState(alpha_d, alpha_p, demand_level, prob_level, y.size)


def tsb_predict(state: TSBState, horizon: int) -> np.ndarray:
    return np.full(horizon, state.point)


@dataclass
class ADIDAState:
    bucket: int
    level: float
    n: int

    @property
    def point(self) -> float:
        return self.level / self.bucket


def adida_fit(y: np.ndarray, alpha: float | None = None) -> ADIDAState:
    """ADIDA: aggregate to buckets of round(mean inter-demand interval),
    SES on bucket sums (optimized by default, fixed when ``alpha`` is
    given — the SQL-oracle path), disaggregate (adida.rs:12-200)."""
    from .smoothing import ses_fit

    y = np.asarray(y, dtype=np.float64)
    if y.size < 4:
        raise ValueError("need >= 4 points")
    _, intervals = demands_intervals(y)
    if intervals.size == 0:
        raise ValueError("need demand occurrences")
    bucket = max(1, int(round(float(intervals.mean()))))
    nb = y.size // bucket
    if nb < 2:
        bucket = max(1, y.size // 2)
        nb = y.size // bucket
    trimmed = y[y.size - nb * bucket :]
    sums = trimmed.reshape(nb, bucket).sum(axis=1)
    st = ses_fit(sums, alpha=alpha)
    return ADIDAState(bucket, st.level, y.size)


def adida_predict(state: ADIDAState, horizon: int) -> np.ndarray:
    return np.full(horizon, state.point)
