"""Independent brute checks for wave-214 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave214 import (
    Z75,
    lorenz_asymmetry,
    storey_pi0,
)


def _hist(x):
    uk, c = np.unique(x, return_counts=True)
    return uk.astype(np.int64), c.astype(np.int64)


def test_lorenz_asymmetry_matches_definition():
    rng = np.random.default_rng(331)
    for trial in range(8):
        x = rng.integers(1, 5000, 400).astype(np.int64)
        v, c = _hist(x)
        m, delta, s = lorenz_asymmetry(v, c)
        xs = np.sort(x)
        mu = xs.mean()
        mm = int((xs < mu).sum())
        assert m == mm
        xm, xm1 = xs[mm - 1], xs[mm]
        dref = (mu - xm) / (xm1 - xm)
        sref = (mm + dref) / len(xs) \
            + (xs[:mm].sum() + dref * xm1) / xs.sum()
        assert abs(s - sref) < 1e-10, trial


def test_lorenz_asymmetry_direction():
    """Few huge values -> S > 1; few tiny values -> S < 1."""
    base = np.full(200, 100, dtype=np.int64)
    big = base.copy()
    big[:5] = 100000
    v, c = _hist(big + np.arange(200))  # break ties
    _, _, s_big = lorenz_asymmetry(v, c)
    small = base.copy()
    small[:5] = 1
    v, c = _hist(small + np.arange(200))
    _, _, s_small = lorenz_asymmetry(v, c)
    assert s_big > 1.0
    assert s_small < 1.0


def test_storey_pi0_near_one_under_null():
    rng = np.random.default_rng(332)
    p0 = 0.2
    cells = []
    for _ in range(168):
        n = int(rng.integers(300, 600))
        r = int(rng.binomial(n, p0))
        cells.append((n, r))
    used, nl, pi0 = storey_pi0(cells)
    # under the global null, ~50% of |z| < z75 -> pi0 ~ 1
    assert 0.75 < pi0 < 1.25
    # z75 is the standard normal upper quartile
    from math import erf, sqrt

    assert abs(0.5 * (1 + erf(Z75 / sqrt(2))) - 0.75) < 1e-9
