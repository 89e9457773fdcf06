"""Scaling / normalization transforms (src/transform/scale.rs) and Box-Cox
(src/transform/boxcox.rs). Pure NumPy, invertible via returned params."""

from __future__ import annotations

import numpy as np


def standardize(y: np.ndarray):
    """(x - mean) / std (population std); returns (scaled, mean, std)."""
    y = np.asarray(y, dtype=np.float64)
    mu = float(y.mean())
    sd = float(y.std())
    if sd == 0.0:
        return np.zeros_like(y), mu, sd
    return (y - mu) / sd, mu, sd


def normalize(y: np.ndarray):
    """Min-max to [0,1]; returns (scaled, min, max)."""
    y = np.asarray(y, dtype=np.float64)
    lo, hi = float(y.min()), float(y.max())
    if hi == lo:
        return np.zeros_like(y), lo, hi
    return (y - lo) / (hi - lo), lo, hi


def robust_scale(y: np.ndarray):
    """(x - median) / IQR; returns (scaled, median, iqr)."""
    y = np.asarray(y, dtype=np.float64)
    med = float(np.median(y))
    q1, q3 = np.percentile(y, [25, 75])
    iqr = float(q3 - q1)
    if iqr == 0.0:
        return np.zeros_like(y), med, iqr
    return (y - med) / iqr, med, iqr


def scale_to_range(y: np.ndarray, lo: float, hi: float):
    y = np.asarray(y, dtype=np.float64)
    n, mn, mx = normalize(y)
    return n * (hi - lo) + lo, mn, mx


def center(y: np.ndarray):
    y = np.asarray(y, dtype=np.float64)
    mu = float(y.mean())
    return y - mu, mu


def boxcox(y: np.ndarray, lam: float) -> np.ndarray:
    """Box-Cox power transform; lambda=0 -> log (boxcox.rs:32-48).
    Requires positive data."""
    y = np.asarray(y, dtype=np.float64)
    if (y <= 0).any():
        raise ValueError("Box-Cox requires positive data")
    if abs(lam) < 1e-10:
        return np.log(y)
    if lam == 0.5:
        # sqrt is IEEE-correctly-rounded (np.power is not): exact, faster,
        # and bitwise-replayable by the SQL oracle
        return (np.sqrt(y) - 1.0) / 0.5
    if lam == 2.0:
        return (y * y - 1.0) / 2.0
    return (np.power(y, lam) - 1.0) / lam


def inv_boxcox(z: np.ndarray, lam: float) -> np.ndarray:
    z = np.asarray(z, dtype=np.float64)
    if abs(lam) < 1e-10:
        return np.exp(z)
    return np.power(lam * z + 1.0, 1.0 / lam)


def boxcox_lambda_guerrero(
    y: np.ndarray, period: int = 2, bounds=(-1.0, 2.0)
) -> float:
    """Guerrero's method: pick lambda minimizing the coefficient of
    variation of sd/mean^(1-lam) across sub-series groups
    (boxcox.rs:82-150 approach)."""
    y = np.asarray(y, dtype=np.float64)
    m = max(2, int(period))
    ng = y.size // m
    if ng < 2:
        return 1.0
    g = y[: ng * m].reshape(ng, m)
    means = g.mean(axis=1)
    stds = g.std(axis=1, ddof=1)
    ok = means > 0
    if ok.sum() < 2:
        return 1.0
    means, stds = means[ok], stds[ok]

    def cv(lam):
        ratio = stds / np.power(means, 1.0 - lam)
        mu = ratio.mean()
        if mu == 0:
            return np.inf
        return ratio.std(ddof=1) / mu

    lams = np.linspace(bounds[0], bounds[1], 61)
    return float(lams[int(np.argmin([cv(l) for l in lams]))])


def is_boxcox_suitable(y: np.ndarray) -> bool:
    y = np.asarray(y, dtype=np.float64)
    return bool((y > 0).all())


def boxcox_shifted(y: np.ndarray, lam: float):
    """Shift non-positive data above 0, then transform; returns
    (transformed, shift)."""
    y = np.asarray(y, dtype=np.float64)
    lo = float(y.min())
    shift = -lo + 1.0 if lo <= 0 else 0.0
    return boxcox(y + shift, lam), shift
