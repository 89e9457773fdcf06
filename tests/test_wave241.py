"""Independent brute check for the wave-241 bimodality index."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave241 import (
    bimodality,
)


def _moments(x):
    return (len(x), int(x.sum()), int((x**2).sum()),
            int((x**3).sum()),
            int((x.astype(object) ** 4).sum()))


def test_bimodality_separates_shapes():
    rng = np.random.default_rng(591)
    # unimodal normal-ish: BC < 5/9
    uni = np.round(rng.normal(100, 15, 20000)).astype(np.int64)
    g1u, g2u, bcu = bimodality(*_moments(uni))
    # two well-separated modes: BC > 5/9
    bi = np.concatenate([
        np.round(rng.normal(50, 5, 10000)),
        np.round(rng.normal(150, 5, 10000))]).astype(np.int64)
    g1b, g2b, bcb = bimodality(*_moments(bi))
    assert bcu < 5 / 9 < bcb


def test_bimodality_matches_scipy_free_reference():
    rng = np.random.default_rng(592)
    x = rng.integers(0, 600, 3000).astype(np.int64)
    g1, g2, bc = bimodality(*_moments(x))
    n = len(x)
    xf = x.astype(float)
    m2 = ((xf - xf.mean()) ** 2).mean()
    m3 = ((xf - xf.mean()) ** 3).mean()
    m4 = ((xf - xf.mean()) ** 4).mean()
    g1r = np.sqrt(n * (n - 1)) / (n - 2) * m3 / m2**1.5
    g2r = (n - 1) / ((n - 2) * (n - 3)) \
        * ((n + 1) * (m4 / m2**2 - 3) + 6)
    assert abs(g1 - g1r) < 1e-8
    assert abs(g2 - g2r) < 1e-8
    bcr = (g1r**2 + 1) / (g2r + 3 * (n - 1) ** 2
                          / ((n - 2) * (n - 3)))
    assert abs(bc - bcr) < 1e-10
