"""Independent brute checks for wave-220 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave220 import (
    bartels_rvn,
    powerlaw_alpha,
)


def test_powerlaw_recovers_exponent():
    """The CSN continuous approximation is accurate for xmin >~ 6
    (Clauset et al. 2009 §3.2) — verify at xmin = 10."""
    rng = np.random.default_rng(391)
    alpha_true = 2.5
    xmin = 10
    u = rng.random(50000)
    x = np.floor(xmin * (1 - u) ** (-1 / (alpha_true - 1))) \
        .astype(np.int64)
    x = x[x >= xmin]
    uk, c = np.unique(x, return_counts=True)
    n, a = powerlaw_alpha([int(v) for v in uk],
                          [int(v) for v in c], xmin=xmin)
    assert n == len(x)
    assert abs(a - alpha_true) < 0.06
    ref = 1 + len(x) / np.log(x / (xmin - 0.5)).sum()
    assert abs(a - ref) < 1e-9


def test_bartels_matches_rank_definition():
    rng = np.random.default_rng(392)
    for trial in range(8):
        x = rng.integers(0, 12, 50)
        num, den, rvn = bartels_rvn(list(x))
        # midranks via scipy-free average ranks
        order = np.argsort(x, kind="stable")
        n = len(x)
        r = np.empty(n)
        sv = x[order]
        i = 0
        while i < n:
            j = i
            while j < n and sv[j] == sv[i]:
                j += 1
            r[i:j] = (i + 1 + j) / 2
            i = j
        ranks = np.empty(n)
        ranks[order] = r
        ref = (np.diff(ranks) ** 2).sum() \
            / ((ranks - (n + 1) / 2) ** 2).sum()
        assert abs(rvn - ref) < 1e-12, trial


def test_bartels_detects_serial_dependence():
    # smooth trend: RVN << 2; alternating: RVN >> 2
    smooth = list(range(60))
    _, _, r1 = bartels_rvn(smooth)
    alt = [0, 9] * 30
    _, _, r2 = bartels_rvn(alt)
    assert r1 < 0.5
    assert r2 > 3.0
