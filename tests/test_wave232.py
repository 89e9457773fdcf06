"""Independent brute check for the wave-232 LID estimator."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave232 import (
    lid_scores,
)


def test_lid_tracks_true_dimension():
    rng = np.random.default_rng(501)
    n = 400
    # points on a 2-D plane embedded in 8-D: LID ~ 2
    flat = np.zeros((n, 8))
    flat[:, :2] = rng.normal(0, 1, (n, 2))
    m2 = np.round(flat * 1e6).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    lids2 = [v for _, v in lid_scores(m2, ids)]
    # full 8-D cloud: LID ~ 8
    full = rng.normal(0, 1, (n, 8))
    m8 = np.round(full * 1e6).astype(np.int64)
    lids8 = [v for _, v in lid_scores(m8, ids)]
    assert 1.2 < float(np.median(lids2)) < 3.2
    assert float(np.median(lids8)) > 4.5
    assert np.median(lids8) > np.median(lids2)


def test_lid_matches_mle_formula():
    rng = np.random.default_rng(502)
    m = np.round(rng.normal(0, 1, (60, 4)) * 1e6).astype(
        np.int64)
    ids = np.arange(60, dtype=np.int64)
    got = dict(lid_scores(m, ids))
    dist = np.sqrt(((m[:, None].astype(float)
                     - m[None].astype(float)) ** 2).sum(-1))
    k = 10
    for a in range(0, 60, 7):
        ds = np.sort(dist[a][dist[a] > 0])[:k]
        ref = -k / np.log(ds / ds[-1]).sum()
        assert abs(got[a] - ref) < 1e-6 * max(1.0, ref), a
