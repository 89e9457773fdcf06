"""Independent brute checks for wave-207 VAR operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave207 import (
    var1_fit,
    var1_irf,
)


def test_var1_matches_lstsq():
    rng = np.random.default_rng(261)
    T = 200
    e = np.zeros(T)
    p = np.zeros(T)
    e[0], p[0] = 20, 30
    for t in range(1, T):
        e[t] = 0.5 * e[t - 1] + 0.2 * p[t - 1] + \
            rng.normal(10, 2)
        p[t] = 0.1 * e[t - 1] + 0.6 * p[t - 1] + \
            rng.normal(8, 2)
    e = np.round(e).astype(np.int64)
    p = np.round(p).astype(np.int64)
    a11, a12, a21, a22, r = var1_fit(e, p)
    X = np.column_stack([np.ones(T - 1), e[:-1], p[:-1]]) \
        .astype(float)
    ce, *_ = np.linalg.lstsq(X, e[1:].astype(float), rcond=None)
    cp, *_ = np.linalg.lstsq(X, p[1:].astype(float), rcond=None)
    assert abs(a11 - ce[1]) < 1e-6
    assert abs(a12 - ce[2]) < 1e-6
    assert abs(a21 - cp[1]) < 1e-6
    assert abs(a22 - cp[2]) < 1e-6
    A = np.array([[a11, a12], [a21, a22]])
    assert abs(r - max(abs(np.linalg.eigvals(A)))) < 1e-9


def test_irf_matches_matrix_power():
    A = np.array([[0.5, 0.2], [0.1, 0.6]])
    rows = var1_irf(0.5, 0.2, 0.1, 0.6)
    v = np.array([0.0, 1.0])
    for k, resp in rows:
        v = A @ v
        assert abs(resp - v[0]) < 1e-12, k
