"""Independent brute check for the wave-222 Engle-Granger test."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave222 import (
    engle_granger,
)


def test_engle_granger_distinguishes_cointegrated():
    rng = np.random.default_rng(411)
    n = 400
    # common stochastic trend -> cointegrated
    w = np.cumsum(rng.normal(0, 5, n))
    x = np.round(1000 + w + rng.normal(0, 3, n)).astype(np.int64)
    y = np.round(500 + 2 * w
                 + rng.normal(0, 3, n)).astype(np.int64)
    b1, g1, t1 = engle_granger(list(y), list(x))
    # independent random walks -> not cointegrated
    x2 = np.round(1000 + np.cumsum(rng.normal(0, 5, n))).astype(
        np.int64)
    y2 = np.round(500 + np.cumsum(rng.normal(0, 5, n))).astype(
        np.int64)
    b2, g2, t2 = engle_granger(list(y2), list(x2))
    assert t1 < -6          # strongly stationary residuals
    assert t1 < t2          # more negative than the spurious pair
    assert abs(b1 - 2.0) < 0.1


def test_engle_granger_matches_numpy_steps():
    rng = np.random.default_rng(412)
    x = rng.integers(50, 200, 100).astype(np.int64)
    y = (3 * x + rng.integers(0, 30, 100)).astype(np.int64)
    b, g, t = engle_granger(list(y), list(x))
    coef = np.polyfit(x.astype(float), y.astype(float), 1)
    assert abs(b - coef[0]) < 1e-8
    res = y - (coef[1] + coef[0] * x)
    de = np.diff(res)
    gref = (res[:-1] * de).sum() / (res[:-1] ** 2).sum()
    assert abs(g - gref) < 1e-8
    u = de - gref * res[:-1]
    s2 = (u * u).sum() / (len(y) - 2)
    tref = gref / np.sqrt(s2 / (res[:-1] ** 2).sum())
    assert abs(t - tref) < 1e-8
