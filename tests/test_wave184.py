"""Independent brute checks for wave-184 signal operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave184 import (
    goertzel_power,
    savgol5,
)


def test_goertzel_matches_direct_dft():
    rng = np.random.default_rng(31)
    for trial in range(8):
        n = int(rng.integers(48, 400))
        t = np.arange(n)
        x = (100 + 30 * np.sin(2 * np.pi * t / 24)
             + rng.normal(0, 5, n))
        p = goertzel_power(x)
        w = 2 * np.pi / 24
        X = np.sum(x * np.exp(-1j * w * t))
        assert abs(p - abs(X) ** 2) < 1e-6 * max(1.0, abs(X) ** 2)


def test_savgol_equals_local_quadratic_fit():
    rng = np.random.default_rng(32)
    s = rng.integers(0, 10000, 40).astype(np.int64)
    got = savgol5(s)
    for i in range(2, len(s) - 2):
        ys = s[i - 2: i + 3].astype(float)
        coef = np.polyfit(np.arange(-2, 3), ys, 2)
        assert abs(got[i - 2] - coef[2]) < 1e-8 * max(
            1.0, abs(coef[2]))


def test_savgol_reproduces_quadratic_exactly():
    t = np.arange(30)
    s = (3 * t * t + 7 * t + 11).astype(np.int64)
    got = savgol5(s)
    want = s[2:-2].astype(float)
    assert np.allclose(got, want, atol=1e-9)
