"""Dynamic Theta Models (DSTM / DOTM).

Reference semantics (src/models/theta/dynamic.rs, re-derived):
- state [level, meany, An, Bn] initialized from a regression on the first
  min(10, n) points (:414-441)
- per-step update (:444-478):
    level' = a*y + (1-a)*level
    meany' = (i*meany + y)/(i+1)
    Bn'    = ((i-1)*Bn + 6*(y - meany)/(i+1)) / (i+2)   [uses OLD meany]
    An'    = meany' - Bn'*(i+2)/2
- one-step forecast at step i (:482-520 MSE loop):
    f_i = level + (1 - 1/theta) * (An*b^i + Bn*(1 - b^(i+1))/a), b = 1-a
- h-step forecast from the end (:624-641): same formula at i = n+h-1 with
  the final state
- DOTM: Nelder-Mead over (alpha, theta), multi-start
  [0.1,2],[0.3,2],[0.5,2],[0.1,3], bounds (0.01,0.99)x(1,10), max_iter
  200 tol 1e-6, objective = in-sample one-step MSE (:531-560)
- seasonal gate + classical decomposition shared with the Theta STM
  kernel (same calculate_seasonal_component / fallback rules)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .optimization import NelderMeadConfig, nelder_mead
from .stats import residual_variance
from .theta import classical_seasonal_component, seasonal_test


def _init_state(y: np.ndarray):
    n = y.size
    level = float(y[0])
    meany = float(y[0])
    init_n = min(10, n)
    x = np.arange(init_n, dtype=np.float64)
    x_mean = (init_n - 1) / 2.0
    y_mean = float(y[:init_n].mean())
    ss_xx = float(((x - x_mean) ** 2).sum())
    ss_xy = float(((x - x_mean) * (y[:init_n] - y_mean)).sum())
    bn = ss_xy / ss_xx if ss_xx > 0 else 0.0
    an = y_mean - bn * x_mean
    return level, meany, an, bn


def _scan(y: np.ndarray, alpha: float, theta: float):
    """Run the dynamic recursion; returns (fitted, level, an, bn)."""
    n = y.size
    b = 1.0 - alpha
    level, meany, an, bn = _init_state(y)
    fitted = np.full(n, np.nan)
    yl = y.tolist()
    coef = 1.0 - 1.0 / theta
    for i in range(1, n):
        fitted[i] = level + coef * (
            an * b**i + bn * (1.0 - b ** (i + 1)) / alpha
        )
        yt = yl[i]
        level = alpha * yt + b * level
        new_meany = (i * meany + yt) / (i + 1.0)
        bn = ((i - 1.0) * bn + 6.0 * (yt - meany) / (i + 1.0)) / (i + 2.0)
        an = new_meany - bn * (i + 2.0) / 2.0
        meany = new_meany
    return fitted, level, an, bn


def _mse(y: np.ndarray, alpha: float, theta: float) -> float:
    if y.size < 3:
        return np.finfo(np.float64).max
    fitted, *_ = _scan(y, alpha, theta)
    err = y[1:] - fitted[1:]
    return float(np.dot(err, err)) / err.size


@dataclass
class DynamicThetaState:
    alpha: float
    theta: float
    level: float
    an: float
    bn: float
    multiplicative: bool
    seasonal_forecast: np.ndarray
    fitted: np.ndarray
    residuals: np.ndarray
    variance: float
    n: int


def dynamic_theta_fit(
    y: np.ndarray,
    alpha: float = 0.1,
    theta: float = 2.0,
    period: int = 0,
    optimize: bool = False,
) -> DynamicThetaState:
    y = np.asarray(y, dtype=np.float64)
    if y.size < 4:
        raise ValueError("need >= 4 points")
    n = y.size

    should_decompose = (
        period >= 4 and n >= 2 * period and seasonal_test(y, period)
    )
    eff_mult = True
    if should_decompose:
        if (y <= 0.0).any():
            eff_mult = False
        else:
            _, lc = classical_seasonal_component(y, period, True)
            if lc.size and (lc < 0.01).any():
                eff_mult = False
        full_seasonal, seasonal_forecast = classical_seasonal_component(
            y, period, eff_mult
        )
    else:
        full_seasonal, seasonal_forecast = np.zeros(0), np.zeros(0)

    deseason = (
        (y / full_seasonal if eff_mult else y - full_seasonal)
        if full_seasonal.size
        else y.copy()
    )

    if optimize:
        cfg = NelderMeadConfig(max_iter=200, tolerance=1e-6)
        best, best_v = (0.1, 2.0), np.inf
        for start in ([0.1, 2.0], [0.3, 2.0], [0.5, 2.0], [0.1, 3.0]):
            res = nelder_mead(
                lambda p: np.finfo(np.float64).max
                if not (0.01 < p[0] < 0.99 and 1.0 <= p[1] <= 10.0)
                else _mse(deseason, p[0], p[1]),
                start,
                [(0.01, 0.99), (1.0, 10.0)],
                cfg,
            )
            if res.optimal_value < best_v:
                best, best_v = tuple(res.optimal_point), res.optimal_value
        alpha, theta = float(np.clip(best[0], 0.01, 0.99)), float(
            np.clip(best[1], 1.0, 10.0)
        )
    else:
        alpha = float(np.clip(alpha, 0.01, 0.99))

    fitted_ds, level, an, bn = _scan(deseason, alpha, theta)
    if full_seasonal.size:
        fitted = (
            fitted_ds * full_seasonal if eff_mult else fitted_ds + full_seasonal
        )
    else:
        fitted = fitted_ds
    residuals = y - fitted
    return DynamicThetaState(
        alpha=alpha, theta=theta, level=level, an=an, bn=bn,
        multiplicative=eff_mult, seasonal_forecast=seasonal_forecast,
        fitted=fitted, residuals=residuals,
        variance=residual_variance(residuals, skip=1), n=n,
    )


def dynamic_theta_predict(state: DynamicThetaState, horizon: int) -> np.ndarray:
    b = 1.0 - state.alpha
    coef = 1.0 - 1.0 / state.theta
    out = np.empty(horizon)
    for h in range(1, horizon + 1):
        i = state.n + h - 1
        out[h - 1] = state.level + coef * (
            state.an * b**i + state.bn * (1.0 - b ** (i + 1)) / state.alpha
        )
    if state.seasonal_forecast.size:
        m = state.seasonal_forecast.size
        s = state.seasonal_forecast[np.arange(horizon) % m]
        out = out * s if state.multiplicative else out + s
    return out
