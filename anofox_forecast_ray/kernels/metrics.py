"""Forecast accuracy metrics (src/utils/metrics.rs:7-203): MAE, MSE, RMSE,
MAPE, sMAPE, MASE, R^2."""

from __future__ import annotations

import numpy as np


def mae(actual, pred):
    a, p = np.asarray(actual, float), np.asarray(pred, float)
    return float(np.mean(np.abs(a - p)))


def mse(actual, pred):
    a, p = np.asarray(actual, float), np.asarray(pred, float)
    return float(np.mean((a - p) ** 2))


def rmse(actual, pred):
    return float(np.sqrt(mse(actual, pred)))


def mape(actual, pred):
    a, p = np.asarray(actual, float), np.asarray(pred, float)
    nz = a != 0
    if not nz.any():
        return float("nan")
    return float(np.mean(np.abs((a[nz] - p[nz]) / a[nz])) * 100.0)


def smape(actual, pred):
    a, p = np.asarray(actual, float), np.asarray(pred, float)
    denom = (np.abs(a) + np.abs(p)) / 2.0
    nz = denom != 0
    if not nz.any():
        return float("nan")
    return float(np.mean(np.abs(a[nz] - p[nz]) / denom[nz]) * 100.0)


def mase(actual, pred, train, period: int = 1):
    a, p = np.asarray(actual, float), np.asarray(pred, float)
    t = np.asarray(train, float)
    if t.size <= period:
        return float("nan")
    scale = np.mean(np.abs(t[period:] - t[:-period]))
    if scale == 0:
        return float("nan")
    return float(np.mean(np.abs(a - p)) / scale)


def r2(actual, pred):
    a, p = np.asarray(actual, float), np.asarray(pred, float)
    ss_res = float(((a - p) ** 2).sum())
    ss_tot = float(((a - a.mean()) ** 2).sum())
    if ss_tot == 0:
        return float("nan")
    return 1.0 - ss_res / ss_tot


def coverage_rate(actual, lower, upper) -> float:
    """Proportion of actuals inside [lower, upper]
    (tests/interval_calibration.rs:21-33)."""
    a = np.asarray(actual, float)
    lo = np.asarray(lower, float)
    up = np.asarray(upper, float)
    if a.size == 0:
        return 0.0
    return float(np.mean((a >= lo) & (a <= up)))


def winkler_score(actual, lower, upper, alpha: float) -> float:
    """Mean Winkler interval score, lower is better: width plus
    (2/alpha) x miss distance outside the interval
    (tests/interval_calibration.rs:36-60)."""
    a = np.asarray(actual, float)
    lo = np.asarray(lower, float)
    up = np.asarray(upper, float)
    if a.size == 0:
        return float("inf")
    width = up - lo
    pen = np.where(
        a < lo, (2.0 / alpha) * (lo - a),
        np.where(a > up, (2.0 / alpha) * (a - up), 0.0),
    )
    return float(np.mean(width + pen))


def rolling_interval_evaluation(model_factory, y, horizon: int,
                                level: float, n_origins: int):
    """Rolling-origin CV of interval calibration: returns
    (coverage_rate, mean_winkler) — min_train = n // 2, one origin per
    step (tests/interval_calibration.rs:63-121)."""
    y = np.asarray(y, float)
    n = y.size
    min_train = n // 2
    if n < min_train + horizon + n_origins:
        return 0.0, float("inf")
    acts, los, ups = [], [], []
    for i in range(n_origins):
        train_end = min_train + i
        if train_end + horizon > n:
            break
        model = model_factory()
        try:
            model.fit(y[:train_end])
            _, lo, up = model.predict_with_intervals(horizon, level)
        except Exception:
            continue
        acts.append(y[train_end : train_end + horizon])
        los.append(np.asarray(lo, float))
        ups.append(np.asarray(up, float))
    if not acts:
        return 0.0, float("inf")
    a = np.concatenate(acts)
    lo = np.concatenate(los)
    up = np.concatenate(ups)
    return coverage_rate(a, lo, up), winkler_score(a, lo, up, 1.0 - level)


def calculate_metrics(actual, pred, train=None, period: int = 1) -> dict:
    out = {
        "mae": mae(actual, pred),
        "mse": mse(actual, pred),
        "rmse": rmse(actual, pred),
        "mape": mape(actual, pred),
        "smape": smape(actual, pred),
        "r2": r2(actual, pred),
    }
    if train is not None:
        out["mase"] = mase(actual, pred, train, period)
    return out
