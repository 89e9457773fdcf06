"""Independent brute checks for wave-181 statistics."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave181 import (
    bowker_from_counts,
)


def test_bowker_matches_matrix_brute():
    rng = np.random.default_rng(5)
    types = ["a", "b", "c", "d"]
    for trial in range(20):
        m = rng.integers(0, 9, (4, 4))
        counts = {
            (types[i], types[j]): int(m[i, j])
            for i in range(4) for j in range(4) if m[i, j] > 0
        }
        chi2, df, off = bowker_from_counts(counts)
        bchi, bdf, boff = 0.0, 0, 0
        for i in range(4):
            for j in range(4):
                if i != j:
                    boff += int(m[i, j])
        for i in range(4):
            for j in range(i + 1, 4):
                tot = int(m[i, j] + m[j, i])
                if tot > 0:
                    bdf += 1
                    bchi += (int(m[i, j]) - int(m[j, i])) ** 2 / tot
        assert df == bdf and off == boff, trial
        assert abs(chi2 - bchi) < 1e-12, trial


def test_cochran_armitage_equals_sqrtn_pearson():
    """z_CA (no finite-sample correction) == sqrt(N) * Pearson r
    between score and binary outcome — an independent derivation."""
    rng = np.random.default_rng(3)
    for trial in range(10):
        k = rng.integers(0, 24, 500)
        y = (rng.random(500) < 0.1 + 0.02 * (k / 23)).astype(int)
        n = np.bincount(k, minlength=24).astype(np.int64)
        r = np.bincount(k, weights=y.astype(float),
                        minlength=24).astype(np.int64)
        ks = np.arange(24)
        N, R = int(n.sum()), int(r.sum())
        T = int((ks * r).sum())
        s1 = int((ks * n).sum())
        s2 = int((ks * ks * n).sum())
        pbar = R / N
        z = (T - pbar * s1) / np.sqrt(
            pbar * (1 - pbar) * (s2 - (s1 * s1) / N))
        rho = np.corrcoef(k.astype(float), y.astype(float))[0, 1]
        assert abs(z - np.sqrt(N) * rho) < 1e-8, trial
