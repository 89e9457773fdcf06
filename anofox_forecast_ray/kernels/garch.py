"""GARCH(1,1) volatility model via Gaussian MLE.

Reference: src/models/garch.rs:48-600 (Nelder-Mead MLE over
(omega, alpha, beta) with positivity + alpha+beta<1 constraints; the
volatility recursion sigma2_t = omega + alpha*e_{t-1}^2 +
beta*sigma2_{t-1} seeded with the sample variance; mean forecast is the
series mean, the interesting output is the volatility path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead


@dataclass
class GARCHState:
    omega: float
    alpha: float
    beta: float
    mean: float
    sigma2: np.ndarray      # conditional variance path
    residuals: np.ndarray
    log_likelihood: float
    n: int


def _garch_nll(e2: list, omega: float, alpha: float, beta: float,
               s2_0: float) -> float:
    if omega <= 0 or alpha < 0 or beta < 0 or alpha + beta >= 0.999:
        return np.finfo(np.float64).max
    s2 = s2_0
    nll = 0.0
    for x in e2:
        if s2 <= 0:
            return np.finfo(np.float64).max
        nll += math.log(s2) + x / s2
        s2 = omega + alpha * x + beta * s2
    return 0.5 * nll


def garch_fit(y: np.ndarray) -> GARCHState:
    y = np.asarray(y, dtype=np.float64)
    if y.size < 10:
        raise ValueError("need >= 10 points")
    mu = float(y.mean())
    e = y - mu
    e2 = (e * e).tolist()
    var = float(np.var(e))
    cfg = NelderMeadConfig(max_iter=1000, tolerance=1e-8)
    res = nelder_mead(
        lambda p: _garch_nll(e2, p[0], p[1], p[2], var),
        [0.1 * var, 0.1, 0.8],
        [(1e-8, 10 * var if var > 0 else 1.0), (0.0, 0.998), (0.0, 0.998)],
        cfg,
    )
    omega, alpha, beta = (float(v) for v in res.optimal_point)
    s2 = np.empty(y.size)
    s2[0] = var
    for t in range(1, y.size):
        s2[t] = omega + alpha * e[t - 1] ** 2 + beta * s2[t - 1]
    return GARCHState(
        omega=omega, alpha=alpha, beta=beta, mean=mu, sigma2=s2,
        residuals=e, log_likelihood=-float(res.optimal_value), n=y.size,
    )


def garch_fit_fixed(y: np.ndarray, alpha: float = 0.1, beta: float = 0.8,
                    omega: float | None = None) -> GARCHState:
    """GARCH(1,1) volatility path with FIXED parameters (no MLE) — the
    reference recursion (src/models/garch.rs:340-420) seeded at the
    optimizer's starting point omega = 0.1 * var when omega is None.

    Every float sum is a sequential cumsum fold so the DuckDB list_reduce
    oracle replays it bitwise (CLAUDE.md float-fold rule); the sigma2
    recursion itself is inherently sequential on both sides.
    """
    y = np.asarray(y, dtype=np.float64)
    if y.size < 10:
        raise ValueError("need >= 10 points")
    n = y.size
    mu = float(np.cumsum(y)[-1]) / n
    e = y - mu
    e2 = e * e
    var = float(np.cumsum(e2)[-1]) / n
    w = 0.1 * var if omega is None else float(omega)
    s2 = np.empty(n)
    s2[0] = var
    for t in range(1, n):
        s2[t] = w + alpha * e2[t - 1] + beta * s2[t - 1]
    return GARCHState(
        omega=w, alpha=alpha, beta=beta, mean=mu, sigma2=s2,
        residuals=e, log_likelihood=float("nan"), n=n,
    )


def garch_forecast_variance(state: GARCHState, horizon: int) -> np.ndarray:
    """h-step conditional variance forecast."""
    out = np.empty(horizon)
    last_e2 = float(state.residuals[-1] ** 2)
    s2 = state.omega + state.alpha * last_e2 + state.beta * float(state.sigma2[-1])
    persist = state.alpha + state.beta
    uncond = (
        state.omega / (1.0 - persist) if persist < 1.0 else float(state.sigma2[-1])
    )
    for h in range(horizon):
        out[h] = s2
        s2 = state.omega + persist * s2
        # converges to the unconditional variance
    return out


def garch_predict(state: GARCHState, horizon: int) -> np.ndarray:
    return np.full(horizon, state.mean)
