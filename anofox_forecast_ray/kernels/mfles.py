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

The reference's robust (Siegel repeated-median) mode and trend penalty
are not implemented (documented gap).
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


def mfles_fit(
    y: np.ndarray,
    season_length: int = 12,
    max_rounds: int = 20,
    tol: float = 1e-4,
    ses_alpha: float = 0.5,
    multiplicative: bool | None = None,
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
    slope = 0.0
    intercept = 0.0
    fourier_coef = np.zeros(2 * k) if k else np.zeros(0)
    ses_level = 0.0
    last_sse = float(np.dot(resid, resid))
    rounds = 0
    for r in range(1, max_rounds + 1):
        rounds = r
        if seasonal:
            coef, *_ = np.linalg.lstsq(X, resid, rcond=None)
            fourier_coef += coef
            resid -= X @ coef
        if r % 2 == 1:
            # linear trend round
            tm = t.mean()
            ss_xx = float(np.dot(t - tm, t - tm))
            b = float(np.dot(t - tm, resid - resid.mean())) / ss_xx
            a = float(resid.mean()) - b * tm
            slope += b
            intercept += a
            resid -= a + b * t
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
    )


def mfles_predict(state: MFLESState, horizon: int) -> np.ndarray:
    n, s = state.n, state.season_length
    t = np.arange(n, n + horizon, dtype=np.float64)
    z = np.full(horizon, state.median + state.ses_level)
    z += state.intercept + state.slope * t
    if state.fourier_k:
        for j in range(1, state.fourier_k + 1):
            w = 2.0 * np.pi * j * t / s
            z += state.fourier_coef[2 * (j - 1)] * np.sin(w)
            z += state.fourier_coef[2 * (j - 1) + 1] * np.cos(w)
    if state.multiplicative:
        return np.exp(z)
    return z * state.std + state.mean
