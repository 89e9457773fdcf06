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
