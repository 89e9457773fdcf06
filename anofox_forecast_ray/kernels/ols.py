"""Multivariate OLS for exogenous regressors.

Reference semantics (src/utils/ols.rs:94-256): design matrix = intercept +
named regressor columns; coefficients via least squares; ``ols_residuals``
returns y minus the regressor contribution (series models then fit the
adjusted series, and predictions add back X_future @ beta — the exog flow
of naive.rs:92-240 / theta/model.rs:642-652).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class OLSResult:
    intercept: float
    coefficients: np.ndarray      # per regressor, in column order
    regressor_names: list
    r_squared: float


def _fold_sum(v: np.ndarray) -> float:
    """Sequential left-fold sum (cumsum), bit-matching a DuckDB
    list_reduce — numpy's pairwise np.sum does NOT."""
    return float(np.cumsum(v)[-1]) if v.size else 0.0


def ols_fit(y: np.ndarray, regressors: dict[str, np.ndarray]) -> OLSResult:
    y = np.asarray(y, dtype=np.float64)
    names = sorted(regressors)
    cols = [np.asarray(regressors[n], dtype=np.float64) for n in names]
    k = len(cols)
    if k <= 2:
        # closed-form normal equations with SEQUENTIAL fold sums and
        # Cramer's rule — every operation is replayable in a DuckDB
        # oracle (the lstsq/SVD path is not bit-reproducible in SQL)
        n = float(y.size)
        sy = _fold_sum(y)
        if k == 0:
            beta = np.array([sy / n])
        elif k == 1:
            x1 = cols[0]
            s1 = _fold_sum(x1)
            s11 = _fold_sum(x1 * x1)
            s1y = _fold_sum(x1 * y)
            det = n * s11 - s1 * s1
            if det == 0.0:
                beta = np.array([sy / n, 0.0])
            else:
                b1 = (n * s1y - s1 * sy) / det
                b0 = (sy - b1 * s1) / n
                beta = np.array([b0, b1])
        else:
            x1, x2 = cols
            s1 = _fold_sum(x1)
            s2 = _fold_sum(x2)
            s11 = _fold_sum(x1 * x1)
            s12 = _fold_sum(x1 * x2)
            s22 = _fold_sum(x2 * x2)
            s1y = _fold_sum(x1 * y)
            s2y = _fold_sum(x2 * y)
            det = (n * (s11 * s22 - s12 * s12)
                   - s1 * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s12 - s11 * s2))
            if det == 0.0:
                beta = np.array([sy / n, 0.0, 0.0])
            else:
                d0 = (sy * (s11 * s22 - s12 * s12)
                      - s1 * (s1y * s22 - s12 * s2y)
                      + s2 * (s1y * s12 - s11 * s2y))
                d1 = (n * (s1y * s22 - s12 * s2y)
                      - sy * (s1 * s22 - s12 * s2)
                      + s2 * (s1 * s2y - s1y * s2))
                d2 = (n * (s11 * s2y - s1y * s12)
                      - s1 * (s1 * s2y - s1y * s2)
                      + sy * (s1 * s12 - s11 * s2))
                beta = np.array([d0 / det, d1 / det, d2 / det])
        X = np.column_stack([np.ones(y.size)] + cols)
    else:
        X = np.column_stack([np.ones(y.size)] + cols)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    fitted = X @ beta
    ss_res = float(((y - fitted) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else float("nan")
    return OLSResult(float(beta[0]), np.asarray(beta[1:]), names, r2)


def ols_predict(res: OLSResult, regressors: dict[str, np.ndarray]) -> np.ndarray:
    cols = [np.asarray(regressors[n], dtype=np.float64)
            for n in res.regressor_names]
    if not cols:
        return np.full(1, res.intercept)
    # explicit column accumulation, NOT a BLAS dot: b0 + (b1*x1 + b2*x2)
    # with plain elementwise rounding — a dgemv may fuse multiply-adds and
    # break bitwise parity with the SQL oracle
    acc = res.coefficients[0] * cols[0]
    for j in range(1, len(cols)):
        acc = acc + res.coefficients[j] * cols[j]
    return res.intercept + acc


def ols_residuals(y: np.ndarray, res: OLSResult,
                  regressors: dict[str, np.ndarray]) -> np.ndarray:
    """y minus the full OLS fit (intercept + contributions)."""
    return np.asarray(y, dtype=np.float64) - ols_predict(res, regressors)
