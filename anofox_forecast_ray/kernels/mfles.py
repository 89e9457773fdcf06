"""MFLES — gradient-boosted Median + Fourier + Linear + Exponential-
Smoothing decomposition.

Core algorithm of src/models/mfles.rs:29-900 (statsforecast's MFLES),
re-implemented in its essential form:

- transform: log when positive+seasonal (multiplicative), else z-score
- round 0 fits the median; then boosting rounds each fit the current
  residual with: Fourier seasonal pair-basis (every round, when seasonal),
  linear trend (odd rounds), SES (even rounds after round 4) — mirroring
  the reference's round schedule (mfles.rs:9,24-25)
- components accumulate; stop on max_rounds or when the SSE improvement
  ratio drops below tol
- forecast: median + accumulated linear slope extrapolation + periodic
  Fourier continuation + flat SES level, inverse-transformed
- robust mode (mfles.rs:422-466,825-906): trend rounds use Siegel
  repeated medians instead of OLS; auto-enabled after round 0 when the
  residual coefficient of variation exceeds 0.7 (statsforecast rule)
- trend penalty (mfles.rs:563-576,650-656): R^2 of the first linear fit
  scales the forecast slope (weak trends are shrunk toward flat)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .smoothing import ses_scan


def _fourier_design(n: int, season: int, k: int) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    cols = []
    for j in range(1, k + 1):
        w = 2.0 * np.pi * j * t / season
        cols.append(np.sin(w))
        cols.append(np.cos(w))
    return np.column_stack(cols)


def siegel_repeated_medians(y: np.ndarray) -> tuple[float, float]:
    """Robust line fit (slope, intercept): for each sampled anchor i the
    median of pairwise slopes to every sampled j, then the median of those
    medians; intercept = median(y_i - slope*i). Subsampled to <=100
    anchors like the reference (mfles.rs:422-466)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 2:
        return 0.0, float(y[0]) if n else 0.0
    step = n // 100 if n > 100 else 1
    idx = np.arange(0, n, step)
    ys = y[idx]
    xs = idx.astype(np.float64)
    # pairwise slopes between sampled anchors, vectorized
    dy = ys[None, :] - ys[:, None]
    dx = xs[None, :] - xs[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        slopes = dy / dx
    med_per_anchor = np.nanmedian(
        np.where(np.isfinite(slopes), slopes, np.nan), axis=1
    )
    med_per_anchor = med_per_anchor[np.isfinite(med_per_anchor)]
    slope = float(np.median(med_per_anchor)) if med_per_anchor.size else 0.0
    intercept = float(np.median(ys - slope * xs))
    return slope, intercept


def calc_cov(y: np.ndarray, multiplicative: bool) -> float:
    """Coefficient of variation (mfles.rs:242-266; statsforecast rule)."""
    y = np.asarray(y, dtype=np.float64)
    if y.size == 0:
        return 0.0
    std = float(y.std())
    if multiplicative:
        return max(float(np.sqrt(np.exp(np.log(10.0) * std * std - 1.0))), 0.0)
    mean = float(y.mean())
    return std / abs(mean) if abs(mean) > 1e-10 else std


def _calc_rsq(residuals: np.ndarray, trend: np.ndarray) -> float:
    ss_res = float(((residuals - trend) ** 2).sum())
    d = residuals - residuals.mean()
    ss_tot = float(np.dot(d, d))
    if ss_tot < 1e-10:
        return 0.0
    return 1.0 - ss_res / ss_tot


@dataclass
class MFLESState:
    season_length: int
    fourier_k: int
    multiplicative: bool
    mean: float
    std: float
    median: float
    slope: float
    intercept: float
    fourier_coef: np.ndarray
    ses_level: float
    ses_alpha: float
    fitted: np.ndarray
    residuals: np.ndarray
    n: int
    rounds: int
    robust: bool = False
    trend_penalty: bool = True
    penalty: float | None = None


def mfles_fit(
    y: np.ndarray,
    season_length: int = 12,
    max_rounds: int = 20,
    tol: float = 1e-4,
    ses_alpha: float = 0.5,
    multiplicative: bool | None = None,
    robust: bool | None = None,
    trend_penalty: bool = True,
) -> MFLESState:
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 4:
        raise ValueError("need >= 4 points")
    seasonal = season_length >= 2 and n >= 2 * season_length
    if multiplicative is None:  # reference auto rule (mfles.rs:730-737)
        multiplicative = seasonal and bool((y > 0).all())
    else:
        multiplicative = multiplicative and bool((y > 0).all())
    if multiplicative:
        z = np.log(y)
        mean, std = 0.0, 1.0
    else:
        mean = float(y.mean())
        std = max(float(y.std()), 1e-10)
        z = (y - mean) / std

    k = max(1, min(5, season_length // 2)) if seasonal else 0
    X = _fourier_design(n, season_length, k) if seasonal else None
    t = np.arange(n, dtype=np.float64)

    resid = z.copy()
    med = float(np.median(resid))
    resid -= med
    # robust auto-detection (statsforecast's CoV > 0.7 rule applied to
    # the RAW series; the reference's residual-based variant
    # (mfles.rs:834-840) degenerates under additive standardization —
    # median-centered residuals have mean ~ 0, so CoV always explodes)
    robust_mode = (
        robust if robust is not None
        else calc_cov(y, multiplicative) > 0.7
    )
    slope = 0.0
    intercept = 0.0
    penalty_val: float | None = None
    fourier_coef = np.zeros(2 * k) if k else np.zeros(0)
    ses_level = 0.0
    last_sse = float(np.dot(resid, resid))
    rounds = 0
    first_trend_round = True
    for r in range(1, max_rounds + 1):
        rounds = r
        if seasonal:
            coef, *_ = np.linalg.lstsq(X, resid, rcond=None)
            fourier_coef += coef
            resid -= X @ coef
        if r % 2 == 1:
            # linear trend round: OLS, or Siegel repeated medians when
            # robust (mfles.rs:900-906)
            if robust_mode:
                b, a = siegel_repeated_medians(resid)
            else:
                tm = t.mean()
                ss_xx = float(np.dot(t - tm, t - tm))
                b = float(np.dot(t - tm, resid - resid.mean())) / ss_xx
                a = float(resid.mean()) - b * tm
            line = a + b * t
            if first_trend_round:
                # trend penalty = R^2 of the first linear fit
                # (mfles.rs:936)
                penalty_val = _calc_rsq(resid, line)
                first_trend_round = False
            slope += b
            intercept += a
            resid -= line
        elif r > 4:
            levels = ses_scan(resid, ses_alpha)
            fitted_ses = np.empty(n)
            fitted_ses[0] = resid[0]
            fitted_ses[1:] = levels[:-1]
            ses_level += float(levels[-1])
            resid -= fitted_ses
        sse = float(np.dot(resid, resid))
        if last_sse > 0 and (last_sse - sse) / last_sse < tol:
            break
        last_sse = sse

    fitted_z = z - resid
    if multiplicative:
        fitted = np.exp(fitted_z)
    else:
        fitted = fitted_z * std + mean
    return MFLESState(
        season_length=season_length, fourier_k=k,
        multiplicative=multiplicative, mean=mean, std=std, median=med,
        slope=slope, intercept=intercept, fourier_coef=fourier_coef,
        ses_level=ses_level, ses_alpha=ses_alpha, fitted=fitted,
        residuals=y - fitted, n=n, rounds=rounds,
        robust=robust_mode, trend_penalty=trend_penalty,
        penalty=penalty_val,
    )


def mfles_predict(state: MFLESState, horizon: int) -> np.ndarray:
    n, s = state.n, state.season_length
    t = np.arange(n, n + horizon, dtype=np.float64)
    z = np.full(horizon, state.median + state.ses_level)
    # trend penalty (mfles.rs:650-660): anchor at the LAST fitted trend
    # point and shrink only the extrapolation slope by the first-fit R^2
    # — weak trends go flat without breaking continuity
    slope = state.slope
    if state.trend_penalty and state.penalty is not None:
        slope = slope * max(state.penalty, 0.0)
    last_trend = state.intercept + state.slope * (n - 1)
    z += last_trend + slope * (t - (n - 1))
    if state.fourier_k:
        for j in range(1, state.fourier_k + 1):
            w = 2.0 * np.pi * j * t / s
            z += state.fourier_coef[2 * (j - 1)] * np.sin(w)
            z += state.fourier_coef[2 * (j - 1) + 1] * np.cos(w)
    if state.multiplicative:
        return np.exp(z)
    return z * state.std + state.mean
