"""Rolling / expanding / EWM window kernels.

Semantics: src/transform/window.rs — trailing windows with NaN for the
warm-up prefix (output[i] = NaN while i+1 < window); expanding stats from
the first element; EWM recurrence ``ewm = a*x + (1-a)*ewm`` seeded with
x[0] (same recurrence as SES).

All vectorized: rolling via sliding_window_view / cumsum diffs, EWM via the
chunked exponential scan from smoothing.ses_scan.
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from .smoothing import ses_scan


def _prefix_nan(out: np.ndarray, window: int) -> np.ndarray:
    res = np.full(out.size + window - 1, np.nan)
    res[window - 1 :] = out
    return res


def rolling_mean(y: np.ndarray, window: int) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    if y.size < window:
        return np.full(y.size, np.nan)
    c = np.concatenate(([0.0], np.cumsum(y)))
    return _prefix_nan((c[window:] - c[:-window]) / window, window)


def rolling_sum(y: np.ndarray, window: int) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    if y.size < window:
        return np.full(y.size, np.nan)
    c = np.concatenate(([0.0], np.cumsum(y)))
    return _prefix_nan(c[window:] - c[:-window], window)


def _rolling_reduce(y, window, fn):
    y = np.asarray(y, dtype=np.float64)
    if y.size < window:
        return np.full(y.size, np.nan)
    return _prefix_nan(fn(sliding_window_view(y, window), axis=1), window)


def rolling_min(y, window):
    return _rolling_reduce(y, window, np.min)


def rolling_max(y, window):
    return _rolling_reduce(y, window, np.max)


def rolling_median(y, window):
    return _rolling_reduce(y, window, np.median)


def rolling_var(y: np.ndarray, window: int, ddof: int = 1) -> np.ndarray:
    """Sample variance per window (window.rs rolling_var uses n-1)."""
    return _rolling_reduce(
        y, window, lambda w, axis: np.var(w, axis=axis, ddof=ddof)
    )


def rolling_std(y, window, ddof: int = 1):
    return np.sqrt(rolling_var(y, window, ddof))


def expanding_mean(y: np.ndarray) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    return np.cumsum(y) / np.arange(1, y.size + 1)


def expanding_sum(y: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(y, dtype=np.float64))


def expanding_min(y: np.ndarray) -> np.ndarray:
    return np.minimum.accumulate(np.asarray(y, dtype=np.float64))


def expanding_max(y: np.ndarray) -> np.ndarray:
    return np.maximum.accumulate(np.asarray(y, dtype=np.float64))


def ewm_mean(y: np.ndarray, alpha: float) -> np.ndarray:
    """EWM via the SES level scan: out[0]=y[0], out[t]=a*y[t]+(1-a)*out[t-1]."""
    return ses_scan(np.asarray(y, dtype=np.float64), alpha)


def ewm_var(y: np.ndarray, alpha: float) -> np.ndarray:
    """EWM variance: v[t] = (1-a)*(v[t-1] + a*(x[t]-m[t-1])^2), v[0]=0
    (window.rs:247-280 recurrence)."""
    y = np.asarray(y, dtype=np.float64)
    m = ewm_mean(y, alpha)
    n = y.size
    v = np.zeros(n)
    for t in range(1, n):  # short series; scan form if hot
        d = y[t] - m[t - 1]
        v[t] = (1.0 - alpha) * (v[t - 1] + alpha * d * d)
    return v


def ewm_std(y: np.ndarray, alpha: float) -> np.ndarray:
    return np.sqrt(ewm_var(y, alpha))
