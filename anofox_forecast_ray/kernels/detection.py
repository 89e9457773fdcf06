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


# --- research detectors (periodicity.rs:361-786, sazed.rs:25-400) ----------

def _acf_hill_validate(r: np.ndarray, p: int) -> bool:
    """Autoperiod hill validation: candidate period sits on an ACF local
    maximum region (Vlachos et al. 2005)."""
    if p < 2 or p + 1 >= r.size:
        return False
    return r[p] > 0 and r[p] >= r[p - 1] - 1e-12 and r[p] >= r[p + 1] - 1e-12


def detect_period_autoperiod(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int | None = None,
    power_quantile: float = 0.95,
):
    """Autoperiod (Vlachos 2005; periodicity.rs:361-585): periodogram
    candidate periods above a power threshold, validated on the ACF hill.
    Returns (period, confidence)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 8:
        return 0, 0.0
    if max_period is None:
        max_period = n // 2
    periods, power = periodogram(y)
    thr = np.quantile(power, power_quantile)
    cand = [
        int(round(p))
        for p, pw in zip(periods, power)
        if pw >= thr and min_period <= p <= max_period
    ]
    if not cand:
        return 0, 0.0
    r = acf_full(y, min(max_period + 2, n - 1))
    best_p, best_v = 0, 0.0
    for p in sorted(set(cand)):
        # climb the hill around p to its local max within +-1
        local = max(range(max(min_period, p - 1), min(p + 2, r.size - 1)),
                    key=lambda k: r[k])
        if _acf_hill_validate(r, local) and r[local] > best_v:
            best_p, best_v = local, float(r[local])
    return best_p, best_v


def detect_period_cfd_autoperiod(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int | None = None,
    cluster_eps: float = 1.0,
):
    """CFD-Autoperiod (Puech et al. 2020; periodicity.rs:588-786):
    detrend by first differences, cluster nearby periodogram candidates,
    validate cluster centroids on the ACF hill."""
    y = np.asarray(y, dtype=np.float64)
    if y.size < 9:
        return 0, 0.0
    dy = np.diff(y)
    n = dy.size
    if max_period is None:
        max_period = n // 2
    periods, power = periodogram(dy)
    thr = np.quantile(power, 0.9)
    cand = sorted(
        p for p, pw in zip(periods, power)
        if pw >= thr and min_period <= p <= max_period
    )
    if not cand:
        return 0, 0.0
    clusters, cur = [], [cand[0]]
    for p in cand[1:]:
        if p - cur[-1] <= cluster_eps:
            cur.append(p)
        else:
            clusters.append(cur)
            cur = [p]
    clusters.append(cur)
    r = acf_full(y, min(max_period + 2, y.size - 1))
    best_p, best_v = 0, 0.0
    for cl in clusters:
        p = int(round(float(np.mean(cl))))
        local = max(range(max(min_period, p - 1), min(p + 2, r.size - 1)),
                    key=lambda k: r[k])
        if _acf_hill_validate(r, local) and r[local] > best_v:
            best_p, best_v = local, float(r[local])
    return best_p, best_v


def detect_period_sazed(y: np.ndarray, max_period: int | None = None):
    """SAZED ensemble (Toller et al. 2019; sazed.rs:25-400): majority of
    (S) spectral argmax, (A) ACF argmax, (ZE) mean zero-crossing distance
    of the centered ACF — each a parameter-free estimator. Returns
    (period, agreement_ratio)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 8:
        return 0, 0.0
    if max_period is None:
        max_period = n // 2
    votes = []
    # S: strongest periodogram period
    periods, power = periodogram(y)
    mask = (periods >= 2) & (periods <= max_period)
    if mask.any():
        votes.append(int(round(periods[np.argmax(np.where(mask, power, -np.inf))])))
    # A: ACF argmax over lags >= 2
    r = acf_full(y, max_period)
    if r.size > 3:
        votes.append(int(np.argmax(r[2:]) + 2))
    # ZE: mean distance between zero crossings of the ACF x 2
    zc = np.flatnonzero(np.diff(np.signbit(r[1:])))
    if zc.size >= 2:
        votes.append(int(round(2.0 * float(np.mean(np.diff(zc))))))
    votes = [v for v in votes if 2 <= v <= max_period]
    if not votes:
        return 0, 0.0
    # majority with +-1 tolerance
    best_p, best_c = 0, 0
    for v in votes:
        c = sum(1 for w in votes if abs(w - v) <= 1)
        if c > best_c:
            best_p, best_c = v, c
    return best_p, best_c / max(len(votes), 1)


def detect_period(y: np.ndarray) -> tuple[int, float]:
    """Convenience ensemble (periodicity.rs:788-800): ACF first, FFT as
    fallback, SAZED as tie-breaker."""
    p_acf, c_acf = detect_period_acf(y)
    if p_acf:
        return p_acf, c_acf
    p_fft, c_fft = detect_period_fft(y)
    if p_fft:
        return p_fft, c_fft
    return detect_period_sazed(y)
