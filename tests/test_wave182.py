"""Independent brute checks for wave-182 statistics."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave182 import (
    kuiper_from_hist,
    ring_moran_geary,
)


def _brute_moran_geary(x):
    n = len(x)
    w = np.zeros((n, n))
    for i in range(n):
        w[i, (i + 1) % n] = 1
        w[i, (i - 1) % n] = 1
    W = w.sum()
    z = x - x.mean()
    num = sum(w[i, j] * z[i] * z[j]
              for i in range(n) for j in range(n))
    den = (z**2).sum()
    moran = (n / W) * num / den
    d = sum(w[i, j] * (x[i] - x[j]) ** 2
            for i in range(n) for j in range(n))
    geary = ((n - 1) / (2 * W)) * d / den
    return moran, geary


def test_ring_moran_geary_matches_textbook_double_loop():
    rng = np.random.default_rng(9)
    for trial in range(10):
        x = rng.integers(1, 500, 24).astype(np.int64)
        mi, gc = ring_moran_geary(x)
        bm, bg = _brute_moran_geary(x.astype(float))
        assert abs(mi - bm) < 1e-10, trial
        assert abs(gc - bg) < 1e-10, trial


def test_kuiper_matches_float_cdf():
    rng = np.random.default_rng(13)
    for trial in range(10):
        x = rng.integers(0, 300, 24).astype(np.int64)
        if x.sum() == 0:
            continue
        dp_num, dm_num, v = kuiper_from_hist(x)
        N = x.sum()
        F = np.cumsum(x) / N
        G = (np.arange(24) + 1) / 24
        dp = max(0.0, (F - G).max())
        dm = max(0.0, (G - F).max())
        assert abs(dp_num / (24 * N) - dp) < 1e-12
        assert abs(dm_num / (24 * N) - dm) < 1e-12
        assert abs(v - (dp + dm)) < 1e-12
