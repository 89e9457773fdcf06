"""Independent brute check for the wave-239 MRL curve."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave239 import (
    mrl_rows,
)


def test_mrl_matches_numpy_and_exponential_flatness():
    rng = np.random.default_rng(571)
    # exponential: MRL(u) constant = scale
    x = np.round(rng.exponential(50, 50000)).astype(np.int64)
    rows = mrl_rows(list(x))
    for q, u, na, mrl in rows:
        exc = x[x > u]
        assert na == len(exc)
        assert abs(mrl - (exc - u).mean()) < 1e-9
    mrls = [r[3] for r in rows]
    assert max(mrls) / min(mrls) < 1.25  # memoryless => flat
    # uniform: MRL decreases with u
    y = rng.integers(0, 1000, 20000).astype(np.int64)
    rows2 = mrl_rows(list(y))
    m2 = [r[3] for r in rows2]
    assert m2[0] > m2[-1]
