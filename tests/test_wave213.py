"""Independent brute checks for wave-213 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave213 import (
    extremal_index,
    poincare_sd,
)


def test_poincare_matches_numpy_reference():
    rng = np.random.default_rng(321)
    s = rng.integers(100, 5000, 60).astype(np.int64)
    sd1, sd2 = poincare_sd(list(s))
    d = np.diff(s)
    ref_sd1 = np.sqrt(d.var(ddof=1) / 2)
    ref_sd2 = np.sqrt(2 * s.var(ddof=1) - d.var(ddof=1) / 2)
    assert abs(sd1 - ref_sd1) < 1e-9 * ref_sd1
    assert abs(sd2 - ref_sd2) < 1e-9 * ref_sd2


def test_poincare_white_vs_trended():
    """White noise: SD1 ~ SD2; strong trend: SD2 >> SD1."""
    rng = np.random.default_rng(322)
    w = rng.integers(0, 100, 200).astype(np.int64)
    sd1w, sd2w = poincare_sd(list(w))
    t = (np.arange(200) * 50
         + rng.integers(0, 20, 200)).astype(np.int64)
    sd1t, sd2t = poincare_sd(list(t))
    assert 0.5 < sd1w / sd2w < 1.5
    assert sd1t / sd2t < 0.1


def test_extremal_index_clustered_vs_isolated():
    rng = np.random.default_rng(323)
    # isolated spikes: theta = 1
    x = [10] * 300
    for i in range(10, 290, 30):
        x[i] = 1000
    u, ne, nc, th = extremal_index(x)
    assert th == 1.0
    # clustered spikes (runs of 3): theta ~ 1/3
    x2 = [10] * 300
    for i in range(10, 280, 30):
        x2[i] = x2[i + 1] = x2[i + 2] = 1000
    u2, ne2, nc2, th2 = extremal_index(x2)
    assert abs(th2 - 1 / 3) < 0.05
    # brute recount of clusters for x2
    exc = [1 if v > u2 else 0 for v in x2]
    clusters = 0
    for i, e in enumerate(exc):
        if e and (i < 2 or (exc[i - 1] == 0 and exc[i - 2] == 0)):
            clusters += 1
    assert clusters == nc2
