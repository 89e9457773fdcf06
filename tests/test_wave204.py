"""Independent brute checks for wave-204 cluster diagnostics."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave204 import (
    hopkins_parts,
)


def test_hopkins_separates_clustered_from_uniform():
    rng = np.random.default_rng(231)
    # tight clusters -> H near 1
    centers = rng.integers(-1000000, 1000000, (5, 8))
    pts = np.vstack([c + rng.integers(-100, 100, (40, 8))
                     for c in centers]).astype(np.int64)
    ids = np.arange(len(pts), dtype=np.int64)
    su, sw = hopkins_parts(pts, ids)
    h_clustered = su / (su + sw)
    # uniform cloud -> H near 0.5
    upts = rng.integers(-1000000, 1000000, (200, 8)).astype(
        np.int64)
    su2, sw2 = hopkins_parts(upts, ids)
    h_uniform = su2 / (su2 + sw2)
    assert h_clustered > 0.9
    assert 0.3 < h_uniform < 0.75
    assert h_clustered > h_uniform


def test_dunn_pairwise_identity():
    """The matmul distance identity must equal direct pair loops."""
    rng = np.random.default_rng(232)
    mat = rng.integers(-500, 500, (30, 6)).astype(np.int64)
    sq = (mat * mat).sum(axis=1)
    g = mat @ mat.T
    dist = sq[:, None] + sq[None, :] - 2 * g
    for _ in range(40):
        i, j = rng.integers(0, 30, 2)
        d = mat[i] - mat[j]
        assert dist[i, j] == int((d * d).sum())
