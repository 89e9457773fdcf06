"""Independent brute checks for wave-191 regression diagnostics."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave191 import (
    cramer3,
    ols_line,
)


def test_cramer3_matches_lstsq():
    rng = np.random.default_rng(101)
    for trial in range(8):
        n = int(rng.integers(10, 50))
        x1 = rng.random(n) * 10
        x2 = x1 * x1
        y = 2 + 3 * x1 - 0.5 * x2 + rng.normal(0, 0.1, n)
        fn = float(n)
        a, b, c = cramer3(
            fn, x1.sum(), x2.sum(), (x1 * x1).sum(),
            (x1 * x2).sum(), (x2 * x2).sum(), y.sum(),
            (x1 * y).sum(), (x2 * y).sum())
        X = np.column_stack([np.ones(n), x1, x2])
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert np.allclose([a, b, c], coef, atol=1e-6), trial


def test_influence_matches_hat_matrix():
    """Leverage and Cook's D from the closed form must equal the
    textbook hat-matrix computation."""
    rng = np.random.default_rng(102)
    n = 30
    t = np.arange(n, dtype=np.int64)
    y = (1000 + 50 * t + rng.normal(0, 30, n)).astype(np.int64)
    a, b, nn, mx, sxx = ols_line(t, y)
    X = np.column_stack([np.ones(n), t.astype(float)])
    H = X @ np.linalg.inv(X.T @ X) @ X.T
    href = np.diag(H)
    h = 1.0 / n + (t - mx) ** 2 / sxx
    assert np.allclose(h, href, atol=1e-10)
    e = y - (a + b * t)
    s2 = (e @ e) / (n - 2)
    cd = (e * e) * h / (2 * s2 * (1 - h) ** 2)
    # independent: Cook's D via deletion definition for a few rows
    for i in [0, 7, n - 1]:
        keep = np.ones(n, dtype=bool)
        keep[i] = False
        coef = np.polyfit(t[keep].astype(float),
                          y[keep].astype(float), 1)
        yhat_full = a + b * t.astype(float)
        yhat_del = coef[1] + coef[0] * t.astype(float)
        d_ref = ((yhat_full - yhat_del) ** 2).sum() / (2 * s2)
        assert abs(cd[i] - d_ref) < 1e-6 * max(1.0, d_ref), i
