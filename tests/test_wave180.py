"""Independent brute checks for wave-180 statistics (the wave-99 rule:
never trust a generated-expression gate without a second derivation)."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave180 import (
    ab_from_hist,
    cliffs_from_hist,
)


def _hist_two(x0, x1):
    allv = np.union1d(np.unique(x0), np.unique(x1))
    c0 = np.array([(x0 == v).sum() for v in allv], dtype=np.int64)
    c1 = np.array([(x1 == v).sum() for v in allv], dtype=np.int64)
    return c0, c1


def _brute_ab(x0, x1):
    pooled = np.concatenate([x0, x1])
    order = np.argsort(pooled, kind="stable")
    n = len(pooled)
    ranks = np.arange(1, n + 1)
    scores = np.minimum(ranks, n + 1 - ranks).astype(float)
    sorted_vals = pooled[order]
    avg = np.empty(n)
    i = 0
    while i < n:
        j = i
        while j < n and sorted_vals[j] == sorted_vals[i]:
            j += 1
        avg[i:j] = scores[i:j].mean()
        i = j
    is0 = np.zeros(n, dtype=bool)
    is0[: len(x0)] = True
    ab = avg[np.argsort(order, kind="stable")][is0].sum()
    q = (avg**2).sum()
    n1, n2 = len(x0), len(x1)
    tn = scores.sum()
    e = n1 * tn / n
    var = n1 * n2 * (n * q - tn * tn) / (n * n * (n - 1))
    return ab, (ab - e) / np.sqrt(var)


def _brute_cliffs(x0, x1):
    gt = sum(int(a > b) for a in x0 for b in x1)
    lt = sum(int(a < b) for a in x0 for b in x1)
    tie = sum(int(a == b) for a in x0 for b in x1)
    return gt, lt, tie, (gt - lt) / (len(x0) * len(x1))


def test_ansari_bradley_matches_per_rank_brute():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n0 = int(rng.integers(3, 40))
        n1 = int(rng.integers(3, 40))
        hi = int(rng.integers(4, 25))  # force ties
        x0 = rng.integers(0, hi, n0)
        x1 = rng.integers(0, hi, n1)
        c0, c1 = _hist_two(x0, x1)
        na, nb, ab, z = ab_from_hist(c0, c1)
        bab, bz = _brute_ab(x0, x1)
        assert na == n0 and nb == n1
        assert abs(ab - bab) < 1e-9 * max(1.0, abs(bab)), trial
        assert abs(z - bz) < 1e-9, trial


def test_cliffs_delta_matches_double_loop():
    rng = np.random.default_rng(11)
    for trial in range(20):
        x0 = rng.integers(0, 15, int(rng.integers(2, 30)))
        x1 = rng.integers(0, 15, int(rng.integers(2, 30)))
        c0, c1 = _hist_two(x0, x1)
        got = cliffs_from_hist(c0, c1)
        want = _brute_cliffs(x0, x1)
        assert got[:3] == want[:3], trial
        assert abs(got[3] - want[3]) < 1e-15
