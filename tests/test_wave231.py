"""Independent brute check for the wave-231 LOF."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave231 import (
    daily_lof,
)


def test_lof_flags_isolated_point():
    rng = np.random.default_rng(491)
    # dense cluster + one far outlier
    e = list(rng.integers(95, 106, 60))
    p = list(rng.integers(45, 56, 60))
    e.append(500)
    p.append(500)
    lofs = daily_lof(e, p)
    lofs.sort(key=lambda r: (-r[1], r[0]))
    assert lofs[0][0] == 60  # the injected outlier
    assert lofs[0][1] > 2.0
    # uniform cloud: LOF near 1 for everyone
    e2 = list(rng.integers(0, 1000, 80))
    p2 = list(rng.integers(0, 1000, 80))
    lofs2 = daily_lof(e2, p2)
    vals = [v for _, v in lofs2]
    assert np.median(vals) < 1.6


def test_lof_matches_definitional_reimplementation():
    rng = np.random.default_rng(492)
    e = [int(v) for v in rng.integers(0, 60, 40)]
    p = [int(v) for v in rng.integers(0, 60, 40)]
    got = dict(daily_lof(e, p))
    # independent reimplementation with numpy
    pts = np.array(list(zip(e, p)), dtype=float)
    n = len(pts)
    dist = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    k = 5
    nbrs = []
    for a in range(n):
        order = sorted((dist[a, b], b) for b in range(n)
                       if b != a)
        nbrs.append([b for _, b in order[:k]])
    kd = np.array([max(dist[a, b] for b in nbrs[a])
                   for a in range(n)])
    lrd = np.array([k / sum(max(kd[b], dist[a, b])
                            for b in nbrs[a])
                    for a in range(n)])
    for a in range(n):
        ref = np.mean([lrd[b] for b in nbrs[a]]) / lrd[a]
        assert abs(got[a] - ref) < 1e-9, a
