"""Independent brute check for the wave-235 Toeplitz power mode."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave235 import (
    gammas,
    toeplitz_power,
)


def test_gammas_match_numpy():
    rng = np.random.default_rng(531)
    x = rng.integers(0, 50, 300).astype(np.int64)
    g = gammas(list(x))
    mu = x.mean()
    for h in range(8):
        ref = ((x[: len(x) - h] - mu)
               * (x[h:] - mu)).sum() / len(x)
        assert abs(g[h] - ref) < 1e-9, h


def test_power_iteration_approaches_numpy_eig():
    rng = np.random.default_rng(532)
    # strongly autocorrelated series -> clear dominant mode
    x = np.zeros(600)
    for t in range(1, 600):
        x[t] = 0.85 * x[t - 1] + rng.normal(0, 4)
    xi = np.round(200 + x).astype(np.int64)
    lam, v0 = toeplitz_power(list(xi))
    g = gammas(list(xi))
    C = np.array([[g[abs(i - j)] for j in range(8)]
                  for i in range(8)])
    w, V = np.linalg.eigh(C)
    lam_ref = w[-1]
    vref = V[:, -1]
    vref = vref / np.abs(vref).sum()
    # L1-gain converges to lambda1 * (L1 norm ratio) ~ lambda1
    assert abs(lam - lam_ref) / lam_ref < 0.05
    assert abs(abs(v0) - abs(vref[0])) < 0.05
