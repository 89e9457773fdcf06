"""Independent brute checks for wave-215 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave215 import (
    cochrane_orcutt,
    inar1,
)


def test_inar1_recovers_thinning_rate():
    rng = np.random.default_rng(341)
    alpha_true, lam_true = 0.6, 20.0
    n = 20000
    x = np.zeros(n, dtype=np.int64)
    x[0] = 50
    for t in range(1, n):
        x[t] = rng.binomial(x[t - 1], alpha_true) \
            + rng.poisson(lam_true)
    mu, alpha, lam, vmr = inar1(list(x))
    assert abs(alpha - alpha_true) < 0.03
    assert abs(lam - lam_true) < 1.5
    assert abs(mu - lam_true / (1 - alpha_true)) < 1.5
    # acf check vs numpy
    xc = x - x.mean()
    ref = (xc[:-1] * xc[1:]).sum() / (xc * xc).sum()
    assert abs(alpha - ref) < 1e-9


def test_cochrane_orcutt_recovers_slope_under_ar1_errors():
    rng = np.random.default_rng(342)
    n = 300
    t = np.arange(n)
    e = np.zeros(n)
    for i in range(1, n):
        e[i] = 0.7 * e[i - 1] + rng.normal(0, 50)
    y = np.round(1000 + 12 * t + e).astype(np.int64)
    b_ols, rho, b_co = cochrane_orcutt(list(t), list(y))
    assert abs(rho - 0.7) < 0.15
    assert abs(b_co - 12) < 1.5
    # statsmodels-free reference for step 3
    a0, b0 = np.polynomial.polynomial.polyfit(
        t.astype(float), y.astype(float), 1)
    res = y - (a0 + b0 * t)
    rref = (res[:-1] * res[1:]).sum() / (res * res).sum()
    assert abs(rho - rref) < 1e-9
    ys2 = y[1:] - rref * y[:-1]
    xs2 = t[1:] - rref * t[:-1]
    bref = np.polyfit(xs2.astype(float), ys2.astype(float),
                      1)[0]
    assert abs(b_co - bref) < 1e-8
