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
    # sequential (cumsum) folds, not np.dot: the doc_period_acf SQL
    # oracle replays these sums with list_reduce (CLAUDE.md invariant)
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    d = y - float(np.cumsum(y)[-1]) / n
    var = float(np.cumsum(d * d)[-1])
    out = np.zeros(max_lag + 1)
    out[0] = 1.0
    if var < 1e-12:
        return out
    for k in range(1, min(max_lag, n - 1) + 1):
        out[k] = float(np.cumsum(d[:-k] * d[k:])[-1]) / var
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


def dft_power_seq(y: np.ndarray, ks) -> list[tuple[float, float, float]]:
    """Naive sequential DFT of the mean-centered series at integer
    frequencies ``ks``: per k returns (cos_sum, sin_sum, power) with
    power = (c^2 + s^2) / n — the same normalization as ``periodogram``.

    This is the SQL-oracle-exact path: scalar math.cos/math.sin (same
    libm as DuckDB) folded in series order. It agrees with the FFT
    periodogram bin k to ~1e-8 relative (tested); the FFT is the scale
    path, this anchors its correctness.
    """
    import math

    y = np.asarray(y, dtype=np.float64)
    n = y.size
    m = float(np.cumsum(y)[-1]) / n
    out = []
    for k in ks:
        c = 0.0
        s = 0.0
        for t in range(n):
            d = y[t] - m
            arg = 2.0 * math.pi * k * t / n
            c += d * math.cos(arg)
            s += d * math.sin(arg)
        out.append((c, s, (c * c + s * s) / n))
    return out


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


def welch_power_seq(y: np.ndarray, window_size: int, overlap: float,
                    ks) -> list[tuple[int, float]] | None:
    """Sequential-scalar Welch power at integer frequencies ``ks`` —
    the SQL-oracle-exact anchor for ``welch_periodogram`` (same role as
    dft_power_seq for the FFT periodogram): per segment, sequential
    mean fold, scalar-math Hann window (0.5 - 0.5 cos(2πj/(M-1))),
    scalar DFT sums in position order, powers averaged in segment
    order. Agrees with the FFT path per bin to ~1e-8 relative."""
    import math

    y = np.asarray(y, dtype=np.float64)
    M = window_size
    step = max(1, int(M * (1.0 - overlap)))
    if y.size < M:
        return None
    powers = {k: 0.0 for k in ks}
    nseg = 0
    for start in range(0, y.size - M + 1, step):
        seg = y[start:start + M]
        m = float(np.cumsum(seg)[-1]) / M
        nseg += 1
        for k in ks:
            c = 0.0
            s = 0.0
            for j in range(M):
                w = 0.5 - 0.5 * math.cos(2.0 * math.pi * j / (M - 1))
                d = (float(seg[j]) - m) * w
                arg = 2.0 * math.pi * k * j / M
                c += d * math.cos(arg)
                s += d * math.sin(arg)
            powers[k] += (c * c + s * s) / M
    return [(k, powers[k] / nseg) for k in ks]


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
    # sequential population-variance folds (SQL-oracle replayable)
    nd = detrended.size
    md = float(np.cumsum(detrended)[-1]) / nd
    var_dt = float(np.cumsum((detrended - md) ** 2)[-1]) / nd
    if var_dt < 1e-12:
        return 0.0
    mr = float(np.cumsum(remainder)[-1]) / nd
    var_r = float(np.cumsum((remainder - mr) ** 2)[-1]) / nd
    return max(0.0, 1.0 - var_r / var_dt)


def detect_seasonality(y: np.ndarray, period: int, threshold: float = 0.64) -> bool:
    return seasonal_strength(y, period) >= threshold


# --- research detectors (periodicity.rs:361-786, sazed.rs:25-372),
# paper-faithful: same candidate generation, validation and voting
# mechanics as the reference, not the round-1 quantile heuristics ------------

def periodogram_peaks(y: np.ndarray, threshold: float = 2.0,
                      min_period: int = 2, max_period: int = 365):
    """(period, power) peaks above ``threshold`` x the median noise floor
    of the in-range periodogram, sorted by power desc (fft.rs:91-135;
    integer periods n // k like the reference)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 4:
        return []
    spec = np.abs(np.fft.rfft(y - y.mean())) ** 2 / n
    ks = np.arange(1, spec.size)
    pers = n // ks
    keep = (pers >= max(2, min_period)) & (pers <= max_period)
    if not keep.any():
        return []
    pairs = list(zip(pers[keep].tolist(), spec[1:][keep].tolist()))
    powers = sorted(p for _, p in pairs)
    m = len(powers)
    floor = (powers[m // 2] if m % 2 else
             (powers[m // 2 - 1] + powers[m // 2]) / 2.0)
    peaks = [(p, pw) for p, pw in pairs if pw > floor * threshold]
    peaks.sort(key=lambda t: -t[1])
    return peaks


def _acf_at_lag(y: np.ndarray, lag: int, mean: float, var: float) -> float:
    n = y.size
    if lag >= n or var < 1e-10:
        return 0.0
    d = y - mean
    return float(np.dot(d[: n - lag], d[lag:])) / n / var


def detect_period_autoperiod(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int | None = None,
    power_threshold: float = 3.0,
    acf_threshold: float = 0.2,
):
    """Autoperiod (Vlachos 2005; periodicity.rs:361-585): periodogram
    hints above the noise floor, validated on an ACF hill with up to 10
    gradient-ascent steps, deduped within +-1. Returns (period, score)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if max_period is None:
        max_period = min(365, n // 2)
    if n < min_period * 2:
        return 0, 0.0
    mean = float(y.mean())
    var = float(((y - mean) ** 2).sum()) / n

    def validate(hint: int):
        a = _acf_at_lag(y, hint, mean, var)
        if a < acf_threshold:
            return None
        a_prev = _acf_at_lag(y, hint - 1, mean, var) if hint > 0 else 0.0
        a_next = _acf_at_lag(y, hint + 1, mean, var)
        if a >= a_prev and a >= a_next:
            return hint, a
        # gradient ascent toward the local ACF maximum (10 steps max)
        cur = hint
        for _ in range(10):
            ac = _acf_at_lag(y, cur, mean, var)
            al = _acf_at_lag(y, cur - 1, mean, var) if cur > min_period else 0.0
            ar = (_acf_at_lag(y, cur + 1, mean, var)
                  if cur < max_period and cur + 1 < n // 2 else 0.0)
            if al > ac and al > ar:
                cur -= 1
            elif ar > ac:
                cur += 1
            else:
                return (cur, ac) if ac >= acf_threshold else None
        af = _acf_at_lag(y, cur, mean, var)
        return (cur, af) if af >= acf_threshold else None

    validated = []
    for hint, _pw in periodogram_peaks(y, power_threshold, min_period,
                                       max_period):
        v = validate(hint)
        if v is not None:
            validated.append(v)
    validated.sort(key=lambda t: -t[1])
    deduped = []
    for p, s in validated:
        if not any(abs(p - q) <= 1 for q, _ in deduped):
            deduped.append((p, s))
    if not deduped:
        return 0, 0.0
    p, s = deduped[0]
    return p, float(min(max(s, 0.0), 1.0))


def detect_period_cfd_autoperiod(
    y: np.ndarray,
    min_period: int = 2,
    max_period: int | None = None,
    cluster_eps: float = 2.0,
    power_threshold: float = 2.0,
):
    """CFD-Autoperiod (Puech et al. 2020; periodicity.rs:588-786):
    difference-detrend, periodogram hints, chain-cluster within
    ``cluster_eps``, validate cluster centroids on the ORIGINAL series'
    ACF (> 0.2). Returns (period, score)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if max_period is None:
        max_period = min(365, n // 2)
    if n < min_period * 2 + 1:
        return 0, 0.0
    detrended = np.diff(y)
    hints = periodogram_peaks(detrended, power_threshold, min_period,
                              max_period)
    if not hints:
        return 0, 0.0
    hints.sort(key=lambda t: t[0])
    clusters: list[list[tuple]] = [[hints[0]]]
    for p, s in hints[1:]:
        if p - clusters[-1][-1][0] <= cluster_eps:
            clusters[-1].append((p, s))
        else:
            clusters.append([(p, s)])
    centroids = [
        (sum(p for p, _ in cl) // len(cl), max(s for _, s in cl))
        for cl in clusters
    ]
    mean = float(y.mean())
    var = float(((y - mean) ** 2).sum()) / n
    validated = []
    for p, _ in centroids:
        if p >= n // 2:
            continue
        a = _acf_at_lag(y, p, mean, var)
        if a > 0.2:
            validated.append((p, a))
    if not validated:
        return 0, 0.0
    validated.sort(key=lambda t: -t[1])
    p, s = validated[0]
    return p, float(min(max(s, 0.0), 1.0))


def detect_period_sazed(y: np.ndarray, min_period: int = 2,
                        max_period: int | None = None,
                        vote_tolerance: int = 1):
    """SAZED ensemble (Toller et al. 2019; sazed.rs:25-372): five
    component estimators — (S) top-3 spectral peaks, (A) top-3 strict ACF
    local maxima > 0.2, ACF-weighted-average of positive maxima, (ZE)
    2x mean ACF zero-crossing distance, and divisor refinement of every
    candidate (prefer the fundamental when its ACF is within 10%) — then
    tolerance voting. Returns (period, vote_confidence)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if max_period is None:
        max_period = min(365, n // 2)
    if n < min_period * 2:
        return 0, 0.0
    max_lag = min(max_period, n // 2)
    r = acf_full(y, max_lag)

    cands: list[int] = []
    # S: top-3 spectral peaks
    cands.extend(p for p, _ in
                 periodogram_peaks(y, 2.0, min_period, max_period)[:3])
    # A: top-3 strict ACF local maxima above 0.2
    peaks = [
        (i, r[i])
        for i in range(min_period, min(r.size - 1, max_period))
        if r[i] > r[i - 1] and r[i] > r[i + 1] and r[i] > 0.2
    ]
    peaks.sort(key=lambda t: -t[1])
    cands.extend(i for i, _ in peaks[:3])
    # ACF weighted average of positive local maxima
    ws = [(i, r[i]) for i in range(min_period, min(r.size - 1, max_period))
          if r[i] > r[i - 1] and r[i] > r[i + 1] and r[i] > 0.0]
    if ws:
        wsum = sum(s for _, s in ws)
        cands.append(int(round(sum(i * s for i, s in ws) / wsum)))
    # ZE: zero crossings of the ACF
    signs = r >= 0.0
    crossings = np.flatnonzero(signs[1:] != signs[:-1]) + 1
    if crossings.size >= 2:
        avg_half = float(np.mean(np.diff(crossings)))
        p = int(round(avg_half * 2.0))
        if min_period <= p <= max_period:
            cands.append(p)
    cands = [c for c in cands if min_period <= c <= max_period]
    if not cands:
        return 0, 0.0

    def refine(c: int) -> int:
        best_p, best_a = c, r[c] if c < r.size else 0.0
        for div in range(2, 6):
            if c % div == 0:
                sub = c // div
                if sub >= min_period and sub < r.size:
                    if r[sub] > best_a * 0.9:
                        best_p, best_a = sub, r[sub]
        return best_p

    final = cands + [refine(c) for c in cands]
    # tolerance voting (first-seen bucket wins ties like the reference's
    # HashMap insertion scan)
    buckets: list[list[int]] = []
    for c in final:
        for b in buckets:
            if abs(b[0] - c) <= vote_tolerance:
                b.append(c)
                break
        else:
            buckets.append([c])
    best = max(buckets, key=len)
    return best[0], len(best) / len(final)


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
