"""Detection kernels: outliers, periodicity (ACF / FFT), seasonality
strength, periodogram utilities.

Reference semantics:
- detect_outliers IQR / z-score / modified z-score —
  src/detection/outlier.rs:95-220 (IQR score = distance beyond the
  q1/q3 -/+ mult*IQR bounds scaled by IQR; z = |x-mean|/std; modified z =
  0.6745*|x-med|/MAD)
- ACF periodicity — src/detection/periodicity.rs:74-250 (local maxima of
  the ACF in [min_period, max_period] above a correlation threshold)
- FFT periodicity — periodicity.rs:252-360 + fft.rs:48-145 (periodogram
  peaks mapped to integer periods, power threshold relative to max)
- seasonal_strength — src/detection/seasonality.rs:139-200
  (1 - var(resid)/var(detrended), STL-style strength via MA detrend)
"""

from __future__ import annotations

import numpy as np


def detect_outliers(y: np.ndarray, method: str = "iqr", threshold: float | None = None):
    """Returns (indices, scores, threshold). Scores > threshold = outlier."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0), threshold or 0.0
    if method == "iqr":
        mult = 1.5 if threshold is None else threshold
        finite = np.sort(y[np.isfinite(y)])
        if finite.size < 4:
            return np.zeros(0, dtype=np.int64), np.zeros(n), 1.0
        q1 = finite[finite.size // 4]
        q3 = finite[3 * finite.size // 4]
        iqr = max(q3 - q1, 1e-10)
        lo, hi = q1 - mult * iqr, q3 + mult * iqr
        scores = np.where(
            y < lo, (lo - y) / iqr, np.where(y > hi, (y - hi) / iqr, 0.0)
        )
        thr = 0.0
        idx = np.flatnonzero(scores > thr)
        return idx, scores, thr
    if method == "zscore":
        thr = 3.0 if threshold is None else threshold
        s = y.std()
        scores = np.abs(y - y.mean()) / max(s, 1e-10)
        return np.flatnonzero(scores > thr), scores, thr
    if method == "modified_zscore":
        thr = 3.5 if threshold is None else threshold
        med = np.median(y)
        mad = np.median(np.abs(y - med))
        scores = 0.6745 * np.abs(y - med) / max(mad, 1e-10)
        return np.flatnonzero(scores > thr), scores, thr
    raise ValueError(f"unknown method {method!r}")


def acf_full(y: np.ndarray, max_lag: int) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    d = y - y.mean()
    var = float(np.dot(d, d))
    out = np.zeros(max_lag + 1)
    out[0] = 1.0
    if var < 1e-12:
        return out
    for k in range(1, min(max_lag, n - 1) + 1):
        out[k] = float(np.dot(d[:-k], d[k:])) / var
    return out


def detect_period_acf(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int | None = None,
    threshold: float = 0.3,
):
    """Best period = highest ACF local maximum above threshold.
    Returns (period or 0, confidence)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if max_period is None:
        max_period = n // 2
    max_period = min(max_period, n - 2)
    if max_period < min_period or n < 2 * min_period:
        return 0, 0.0
    r = acf_full(y, max_period + 1)
    best_p, best_v = 0, threshold
    for p in range(max(2, min_period), max_period + 1):
        v = r[p]
        if v > best_v and v >= r[p - 1] and v >= r[p + 1 if p + 1 < r.size else p]:
            best_p, best_v = p, v
    return best_p, (best_v if best_p else 0.0)


def periodogram(y: np.ndarray):
    """(periods, powers) for frequencies 1..n//2 (fft.rs:48-88)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    spec = np.abs(np.fft.rfft(y - y.mean())) ** 2 / n
    freqs = np.arange(spec.size)
    periods = np.zeros(spec.size)
    periods[1:] = n / freqs[1:]
    return periods[1:], spec[1:]


def detect_period_fft(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int | None = None,
    threshold: float = 0.1,
):
    """Best period = strongest periodogram peak within range; confidence =
    peak power / total power."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 4:
        return 0, 0.0
    if max_period is None:
        max_period = n // 2
    periods, power = periodogram(y)
    mask = (periods >= min_period) & (periods <= max_period)
    if not mask.any() or power[mask].max() <= 0:
        return 0, 0.0
    total = power.sum()
    i = np.argmax(np.where(mask, power, -np.inf))
    conf = float(power[i] / total) if total > 0 else 0.0
    if conf < threshold:
        return 0, conf
    return int(round(periods[i])), conf


def welch_periodogram(y: np.ndarray, window_size: int, overlap: float = 0.5):
    """Averaged modified periodogram (fft.rs:147-200), Hann window."""
    y = np.asarray(y, dtype=np.float64)
    step = max(1, int(window_size * (1.0 - overlap)))
    win = np.hanning(window_size)
    segs = []
    for start in range(0, y.size - window_size + 1, step):
        seg = y[start : start + window_size]
        seg = (seg - seg.mean()) * win
        segs.append(np.abs(np.fft.rfft(seg)) ** 2 / window_size)
    if not segs:
        return np.zeros(0), np.zeros(0)
    power = np.mean(segs, axis=0)
    freqs = np.arange(power.size)
    periods = np.zeros(power.size)
    periods[1:] = window_size / freqs[1:]
    return periods[1:], power[1:]


def _centered_ma_trend(y: np.ndarray, period: int) -> np.ndarray:
    """Centered moving-average trend (2xm-MA for even m), NaN at edges —
    same construction as the classical decomposition
    (src/models/theta/model.rs:312-331)."""
    n = y.size
    half = period // 2
    trend = np.full(n, np.nan)
    c = np.concatenate(([0.0], np.cumsum(y)))
    for i in range(half, n - half):
        if period % 2 == 0:
            s = 0.5 * y[i - half] + 0.5 * y[i + half] + (c[i + half] - c[i - half + 1])
        else:
            s = c[i + half + 1] - c[i - half]
        trend[i] = s / period
    return trend


def seasonal_strength(y: np.ndarray, period: int) -> float:
    """STL-style strength: max(0, 1 - var(remainder)/var(detrended))
    with remainder = detrended - seasonal (seasonality.rs:163-220)."""
    from .theta import classical_seasonal_component

    y = np.asarray(y, dtype=np.float64)
    if period < 2 or y.size < 2 * period:
        return 0.0
    full, _ = classical_seasonal_component(y, period, multiplicative=False)
    if full.size == 0:
        return 0.0
    trend = _centered_ma_trend(y, period)
    ok = np.isfinite(trend)
    detrended = y[ok] - trend[ok]
    remainder = detrended - full[ok]
    var_dt = float(np.var(detrended))
    if var_dt < 1e-12:
        return 0.0
    return max(0.0, 1.0 - float(np.var(remainder)) / var_dt)


def detect_seasonality(y: np.ndarray, period: int, threshold: float = 0.64) -> bool:
    return seasonal_strength(y, period) >= threshold
