"""Independent brute checks for wave-210 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave210 import (
    fisher_g,
    gpd_pot,
)


def test_fisher_g_finds_injected_period():
    rng = np.random.default_rng(291)
    n = 480
    t = np.arange(n)
    x = (100 + 40 * np.sin(2 * np.pi * t / 24)
         + rng.normal(0, 3, n))
    k, g, p1 = fisher_g(list(x))
    assert k == n // 24  # frequency index of period 24
    assert g > 0.5
    assert p1 < 1e-6
    # ordinates match numpy FFT power at that frequency
    X = np.fft.fft(x)
    pk = abs(X[k]) ** 2
    tot = sum(abs(X[j]) ** 2 for j in range(1, 120 + 1))
    assert abs(g - pk / tot) < 1e-6


def test_gpd_pot_recovers_exponential_tail():
    """Exponential exceedances => xi ~ 0, sigma ~ scale."""
    rng = np.random.default_rng(292)
    x = np.round(100 + rng.exponential(30, 20000)).astype(int)
    u, ne, xi, sigma = gpd_pot(list(x))
    assert abs(xi) < 0.07
    assert abs(sigma - 30) < 4
    # PWM internals vs numpy on the same exceedances
    xs = np.sort(x)
    r = (9 * len(xs) + 9) // 10
    uu = xs[r - 1]
    y = np.sort(xs[xs > uu] - uu)
    b0 = y.mean()
    b1 = (np.arange(len(y)) * y).sum() / (len(y) * (len(y) - 1))
    assert abs(xi - (2 - b0 / (2 * b1 - b0))) < 1e-9
    a1 = b0 - b1
    assert abs(sigma - 2 * b0 * a1 / (2 * b1 - b0)) < 1e-9
