"""Independent brute checks for wave-199 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave199 import (
    fs_weight,
    rhat_from_moments,
)


def test_fs_u_probability_is_collision_rate():
    """u = sum c^2/N^2 must equal the empirical probability that
    two uniformly drawn records agree (with replacement)."""
    rng = np.random.default_rng(181)
    vals = rng.integers(0, 12, 400)
    uk, c = np.unique(vals, return_counts=True)
    u_num = int((c.astype(np.int64) ** 2).sum())
    u, w = fs_weight(u_num, len(vals))
    # brute: all ordered pairs (i, j)
    agree = sum(int(a == b) for a in vals for b in vals)
    assert abs(u - agree / len(vals) ** 2) < 1e-12
    assert abs(w - np.log2(0.95 / u)) < 1e-12


def test_rhat_matches_definitional_chains():
    rng = np.random.default_rng(182)
    m, n = 8, 50
    chains = rng.normal(100, 10, (m, n))
    chains = np.round(chains).astype(np.int64)
    ns = [n] * m
    s1s = [int(c.sum()) for c in chains]
    s2s = [int((c * c).sum()) for c in chains]
    w, b, r = rhat_from_moments(ns, s1s, s2s)
    means = chains.mean(1)
    varis = chains.var(1, ddof=1)
    bref = n * means.var(ddof=1)
    wref = varis.mean()
    vp = (n - 1) / n * wref + bref / n
    assert abs(w - wref) < 1e-9
    assert abs(b - bref) < 1e-9
    assert abs(r - np.sqrt(vp / wref)) < 1e-12
    # converged chains => R-hat near 1
    assert 0.9 < r < 1.2
