"""Independent brute check for wave-226 robust shape measures."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave226 import (
    bowley_moors,
)


def test_bowley_moors_on_known_shapes():
    rng = np.random.default_rng(441)
    # symmetric: Bowley ~ 0; normal octiles: Moors ~ 1.233
    sym = np.round(rng.normal(0, 1000, 200000)).astype(np.int64)
    b, m = bowley_moors(sym)
    assert abs(b) < 0.02
    assert abs(m - 1.233) < 0.03
    # right-skewed: Bowley > 0
    skew = np.round(rng.lognormal(5, 1, 100000)).astype(np.int64)
    b2, m2 = bowley_moors(skew)
    assert b2 > 0.1


def test_bowley_matches_direct_quantiles():
    rng = np.random.default_rng(442)
    x = rng.integers(0, 100000, 5000).astype(np.int64)
    b, m = bowley_moors(x)
    q1, q2, q3 = (np.quantile(x, p) for p in (0.25, 0.5, 0.75))
    assert abs(b - (q3 + q1 - 2 * q2) / (q3 - q1)) < 1e-12
