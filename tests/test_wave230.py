"""Independent brute check for the wave-230 madogram."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave230 import madogram


def test_madogram_matches_numpy_and_shape():
    rng = np.random.default_rng(481)
    # smooth AR series: gamma grows with lag
    x = np.zeros(500)
    for t in range(1, 500):
        x[t] = 0.9 * x[t - 1] + rng.normal(0, 5)
    xi = np.round(100 + x).astype(np.int64)
    rows = madogram(list(xi))
    for h, m, s, g in rows:
        ref = np.abs(xi[h:] - xi[:-h]).mean() / 2
        assert m == len(xi) - h
        assert abs(g - ref) < 1e-12, h
    gammas = [r[3] for r in rows]
    assert gammas[-1] > gammas[0]  # dependence decays with lag
    # white noise: flat madogram
    w = rng.integers(0, 100, 500).astype(np.int64)
    rw = madogram(list(w))
    gs = [r[3] for r in rw]
    assert max(gs) / min(gs) < 1.2
