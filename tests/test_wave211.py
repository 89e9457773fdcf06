"""Independent brute checks for wave-211 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave211 import (
    variance_time,
    vt_hurst,
)


def test_variance_time_matches_numpy_blocks():
    rng = np.random.default_rng(301)
    x = rng.poisson(40, 500).astype(np.int64)
    rows = variance_time(list(x))
    for m, K, v in rows:
        blocks = x[: K * m].reshape(K, m).sum(axis=1)
        ref = blocks.var(ddof=1) / (m * m)
        assert abs(v - ref) < 1e-9 * max(1.0, ref), m


def test_vt_hurst_on_white_noise_near_half():
    rng = np.random.default_rng(302)
    hs = []
    for _ in range(5):
        x = rng.poisson(100, 2000).astype(np.int64)
        _, h = vt_hurst(list(x))
        hs.append(h)
    assert 0.35 < float(np.mean(hs)) < 0.65


def test_vt_hurst_detects_trend_persistence():
    """A strong trend/smooth component drives H toward 1."""
    t = np.arange(2000)
    x = np.round(1000 + 5 * t
                 + 200 * np.sin(2 * np.pi * t / 500)).astype(
        np.int64)
    _, h = vt_hurst(list(x))
    assert h > 0.9
