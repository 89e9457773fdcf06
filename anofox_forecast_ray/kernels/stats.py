"""Statistical helpers shared by interval math.

``quantile_normal`` reproduces the Abramowitz & Stegun 26.2.23 rational
approximation with the exact coefficients the reference uses
(src/utils/stats.rs:21-50, duplicated at
src/models/baseline/seasonal_naive.rs:190-218) so intervals match to the
same approximation error.
"""

from __future__ import annotations

import math

import numpy as np


def quantile_normal(p: float) -> float:
    if p <= 0.0:
        return float("-inf")
    if p >= 1.0:
        return float("inf")
    t = math.sqrt(-2.0 * math.log(p)) if p < 0.5 else math.sqrt(
        -2.0 * math.log(1.0 - p)
    )
    c0, c1, c2 = 2.515517, 0.802853, 0.010328
    d1, d2, d3 = 1.432788, 0.189269, 0.001308
    result = t - (c0 + c1 * t + c2 * t * t) / (
        1.0 + d1 * t + d2 * t * t + d3 * t * t * t
    )
    return -result if p < 0.5 else result


def residual_variance(residuals: np.ndarray, skip: int = 1) -> float:
    """Reference convention: mean of squared residuals after dropping the
    first ``skip`` (sum_of_squares / len, NOT n-1)."""
    r = np.asarray(residuals, dtype=np.float64)[skip:]
    r = r[np.isfinite(r)]
    if r.size == 0:
        return 0.0
    # sequential (cumsum) fold, not np.dot: the interval-calibration SQL
    # oracle replays this sum with list_reduce (CLAUDE.md float-fold rule)
    return float(np.cumsum(r * r)[-1] / r.size)
