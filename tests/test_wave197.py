"""Independent brute checks for wave-197 location-scale tests."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave197 import (
    cucconi_from_hist,
    wilcoxon_z_from_hist,
)


def _hist_two(x0, x1):
    allv = np.union1d(np.unique(x0), np.unique(x1))
    c0 = np.array([(x0 == v).sum() for v in allv], dtype=np.int64)
    c1 = np.array([(x1 == v).sum() for v in allv], dtype=np.int64)
    return c0, c1


def _midranks(pooled):
    order = np.argsort(pooled, kind="stable")
    n = len(pooled)
    r = np.empty(n)
    sv = pooled[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        r[i:j] = (i + 1 + j) / 2.0
        i = j
    out = np.empty(n)
    out[order] = r
    return out


def test_cucconi_matches_per_rank_brute():
    rng = np.random.default_rng(161)
    for trial in range(10):
        x0 = rng.integers(0, 30, int(rng.integers(8, 40)))
        x1 = rng.integers(0, 30, int(rng.integers(8, 40)))
        c0, c1 = _hist_two(x0, x1)
        u, v, c = cucconi_from_hist(c0, c1)
        pooled = np.concatenate([x0, x1])
        ranks = _midranks(pooled)
        rb = ranks[len(x0):]
        n, n1, n2 = len(pooled), len(x0), len(x1)
        den = np.sqrt(n1 * n2 * (n + 1) * (2 * n + 1)
                      * (8 * n + 11) / 5.0)
        bu = (6 * (rb**2).sum() - n2 * (n + 1) * (2 * n + 1)) \
            / den
        bv = (6 * ((n + 1 - rb) ** 2).sum()
              - n2 * (n + 1) * (2 * n + 1)) / den
        rho = 2 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
        bc = (bu**2 + bv**2 - 2 * rho * bu * bv) \
            / (2 * (1 - rho**2))
        assert abs(u - bu) < 1e-9, trial
        assert abs(v - bv) < 1e-9, trial
        assert abs(c - bc) < 1e-9, trial


def test_wilcoxon_z_matches_per_rank_brute():
    rng = np.random.default_rng(162)
    for trial in range(10):
        x0 = rng.integers(0, 20, int(rng.integers(8, 40)))
        x1 = rng.integers(0, 20, int(rng.integers(8, 40)))
        c0, c1 = _hist_two(x0, x1)
        z = wilcoxon_z_from_hist(c0, c1)
        pooled = np.concatenate([x0, x1])
        ranks = _midranks(pooled)
        w = ranks[: len(x0)].sum()
        n, n1, n2 = len(pooled), len(x0), len(x1)
        e = n1 * (n + 1) / 2
        _, tc = np.unique(pooled, return_counts=True)
        t3 = float((tc**3 - tc).sum())
        var = n1 * n2 / 12 * ((n + 1) - t3 / (n * (n - 1)))
        assert abs(z - (w - e) / np.sqrt(var)) < 1e-9, trial
