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


def ols_fit(y: np.ndarray, regressors: dict[str, np.ndarray]) -> OLSResult:
    y = np.asarray(y, dtype=np.float64)
    names = sorted(regressors)
    X = np.column_stack(
        [np.ones(y.size)] + [np.asarray(regressors[n], dtype=np.float64) for n in names]
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    fitted = X @ beta
    ss_res = float(((y - fitted) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else float("nan")
    return OLSResult(float(beta[0]), beta[1:], names, r2)


def ols_predict(res: OLSResult, regressors: dict[str, np.ndarray]) -> np.ndarray:
    X = np.column_stack(
        [np.asarray(regressors[n], dtype=np.float64) for n in res.regressor_names]
    )
    return res.intercept + X @ res.coefficients


def ols_residuals(y: np.ndarray, res: OLSResult,
                  regressors: dict[str, np.ndarray]) -> np.ndarray:
    """y minus the full OLS fit (intercept + contributions)."""
    return np.asarray(y, dtype=np.float64) - ols_predict(res, regressors)
