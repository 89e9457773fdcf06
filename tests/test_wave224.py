"""Independent brute checks for wave-224 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave224 import (
    variance_ratio,
    zip_mom,
)


def test_variance_ratio_iid_vs_trending():
    rng = np.random.default_rng(431)
    iid = rng.poisson(50, 2000).astype(np.int64)
    vr_iid, z_iid = variance_ratio(list(iid))
    assert abs(vr_iid - 1.0) < 0.25
    # positively autocorrelated increments -> VR > 1
    ar = np.zeros(2000)
    for t in range(1, 2000):
        ar[t] = 0.8 * ar[t - 1] + rng.normal(0, 5)
    arr = np.round(100 + ar).astype(np.int64)
    vr_ar, z_ar = variance_ratio(list(arr))
    assert vr_ar > 2.0
    assert z_ar > z_iid


def test_variance_ratio_matches_numpy():
    rng = np.random.default_rng(432)
    x = rng.integers(0, 30, 300).astype(np.int64)
    vr, z = variance_ratio(list(x))
    mu = x.mean()
    v1 = ((x - mu) ** 2).mean()
    q = 5
    sums = np.convolve(x, np.ones(q, dtype=int), "valid")
    vq = ((sums - q * mu) ** 2).mean() / q
    assert abs(vr - vq / v1) < 1e-10


def test_zip_mom_recovers_parameters():
    rng = np.random.default_rng(433)
    pi_true, lam_true = 0.6, 4.0
    z = rng.random(200000) < pi_true
    x = np.where(z, 0, rng.poisson(lam_true, 200000)).astype(
        np.int64)
    m, lam, pi = zip_mom(len(x), int(x.sum()),
                         int((x * x).sum()))
    assert abs(lam - lam_true) < 0.1
    assert abs(pi - pi_true) < 0.02
    assert abs(m - x.mean()) < 1e-9
