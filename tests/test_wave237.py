"""Independent brute check for the wave-237 GPH estimator."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave237 import gph_d


def test_gph_white_noise_near_zero():
    rng = np.random.default_rng(551)
    ds = []
    for _ in range(6):
        x = rng.poisson(100, 1500).astype(np.int64)
        d, m = gph_d(list(x))
        ds.append(d)
    assert abs(float(np.mean(ds))) < 0.35


def test_gph_detects_long_memory():
    """Cumulative sum of white noise is I(1): d ~ 1."""
    rng = np.random.default_rng(552)
    x = np.round(1000 + np.cumsum(rng.normal(0, 5, 1500))) \
        .astype(np.int64)
    d, _ = gph_d(list(x))
    assert d > 0.7


def test_gph_matches_numpy_periodogram_regression():
    rng = np.random.default_rng(553)
    x = rng.integers(0, 60, 700).astype(np.int64)
    d, m = gph_d(list(x))
    n = len(x)
    X = np.fft.fft(x.astype(float))
    js = np.arange(1, m + 1)
    io = np.abs(X[js]) ** 2
    lam = 2 * np.pi * js / n
    lx = np.log(4 * np.sin(lam / 2) ** 2)
    ly = np.log(io)
    slope = np.polyfit(lx, ly, 1)[0]
    assert abs(d - (-slope)) < 1e-6
