"""Independent brute checks for wave-212 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave212 import (
    gamma_mom,
    slope_from_moments,
)


def test_gamma_mom_recovers_parameters():
    rng = np.random.default_rng(311)
    a_true, th_true = 3.0, 5.0
    x = np.round(rng.gamma(a_true, th_true, 50000)).astype(
        np.int64)
    mu, a, th = gamma_mom(len(x), int(x.sum()),
                          int((x * x).sum()))
    assert abs(mu - a_true * th_true) < 0.3
    assert abs(a - a_true) < 0.3
    assert abs(th - th_true) < 0.5
    # against numpy reference
    assert abs(mu - x.mean()) < 1e-9
    assert abs(a - x.mean() ** 2 / x.var(ddof=1)) < 1e-9


def test_slope_from_moments_matches_polyfit():
    rng = np.random.default_rng(312)
    for trial in range(6):
        x = rng.integers(0, 24, 400).astype(np.int64)
        y = (50 * x + rng.integers(0, 500, 400)).astype(np.int64)
        s = slope_from_moments(len(x), int(x.sum()),
                               int(y.sum()),
                               int((x * x).sum()),
                               int((x * y).sum()))
        ref = np.polyfit(x.astype(float), y.astype(float), 1)[0]
        assert abs(s - ref) < 1e-8 * max(1.0, abs(ref)), trial


def test_simpson_reversal_detected_by_sign_logic():
    """Construct the textbook reversal: within each stratum slope
    negative, aggregate positive."""
    xs, ys, gs = [], [], []
    for g in range(2):
        base = g * 10
        for x in range(5):
            xs.append(base + x)
            ys.append(1000 * g + 100 - 30 * x)
            gs.append(g)
    x = np.array(xs)
    y = np.array(ys)
    agg = slope_from_moments(len(x), int(x.sum()), int(y.sum()),
                             int((x * x).sum()),
                             int((x * y).sum()))
    assert agg > 0
    for g in range(2):
        m = np.array(gs) == g
        s = slope_from_moments(int(m.sum()), int(x[m].sum()),
                               int(y[m].sum()),
                               int((x[m] * x[m]).sum()),
                               int((x[m] * y[m]).sum()))
        assert s < 0
