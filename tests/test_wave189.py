"""Independent brute checks for wave-189 growth-curve fits (the
wave-99 rule: Cramer cofactor expansions must be cross-checked
against an independent linear solver before trusting the gate)."""

import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave189 import bass_fit


def test_bass_cramer_matches_lstsq():
    rng = np.random.default_rng(81)
    for trial in range(8):
        T = int(rng.integers(20, 60))
        n_new = rng.integers(0, 40, T).astype(np.int64)
        n_new[0] = max(1, n_new[0])
        a, b, c, disc, m, p, q = bass_fit(n_new)
        N = np.concatenate(([0], np.cumsum(n_new)))
        x1 = N[1:-1].astype(float)
        y = n_new[1:].astype(float)
        X = np.column_stack([np.ones_like(x1), x1, x1 * x1])
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert abs(a - coef[0]) < 1e-6 * max(1, abs(coef[0]))
        assert abs(b - coef[1]) < 1e-6 * max(1, abs(coef[1]))
        assert abs(c - coef[2]) < 1e-6 * max(1, abs(coef[2]))


def test_bass_recovers_known_parameters():
    """Simulate a noiseless discrete Bass adoption path and verify
    p, q, M come back."""
    p_true, q_true, m_true = 0.03, 0.4, 5000.0
    N = 0.0
    n_new = []
    for _ in range(60):
        n = (p_true + q_true * N / m_true) * (m_true - N)
        n_new.append(int(round(n)))
        N += n_new[-1]
    a, b, c, disc, m, p, q = bass_fit(
        np.array(n_new, dtype=np.int64))
    assert m is not None
    assert abs(m - m_true) / m_true < 0.02
    assert abs(p - p_true) < 0.005
    assert abs(q - q_true) < 0.05


def test_logistic_linearization_recovers_rate():
    k = 1001
    r_true = 0.35
    t0 = 12.0
    ts = np.arange(30)
    N = (k - 1) / (1 + np.exp(-r_true * (ts - t0)))
    N = np.maximum(1, np.round(N)).astype(np.int64)
    ys = np.array([math.log(k / int(v) - 1.0) for v in N])
    coef = np.polyfit(ts.astype(float), ys, 1)
    assert abs(-coef[0] - r_true) < 0.02
    assert abs(-coef[1] / coef[0] - t0) < 1.0
