"""Independent brute checks for wave-217 operators."""

import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave217 import (
    bhattacharyya,
    poisson_surprisals,
)


def test_bhattacharyya_identities():
    # identical profiles: BC = 1, distances 0
    p = [10, 20, 30, 40]
    bc, bd, hel = bhattacharyya(p, [2 * v for v in p])
    assert abs(bc - 1.0) < 1e-12
    assert abs(bd) < 1e-12
    assert hel < 1e-6
    # disjoint: BC = 0 -> hellinger 1
    bc2, _, hel2 = bhattacharyya([10, 0, 5, 0], [0, 7, 0, 3])
    assert bc2 == 0.0
    assert abs(hel2 - 1.0) < 1e-12


def test_bhattacharyya_vs_numpy():
    rng = np.random.default_rng(361)
    p = rng.integers(1, 100, 24)
    q = rng.integers(1, 100, 24)
    bc, bd, hel = bhattacharyya([int(v) for v in p],
                                [int(v) for v in q])
    ref = np.sqrt((p / p.sum()) * (q / q.sum())).sum()
    assert abs(bc - ref) < 1e-10
    assert abs(hel - np.sqrt(1 - ref)) < 1e-10


def test_poisson_surprisal_ranks_extremes():
    mu = 100.0
    days = [(d, 100) for d in range(20)]
    days[7] = (7, 300)
    days[13] = (13, 5)
    rows = poisson_surprisals(days, mu)
    rows.sort(key=lambda r: (-r[2], r[0]))
    top2 = {rows[0][0], rows[1][0]}
    assert top2 == {7, 13}
    # surprisal matches scipy-free exact logpmf via lgamma
    for d, k, s in rows[:3]:
        ref = -(k * math.log(mu) - mu - math.lgamma(k + 1))
        assert abs(s - ref) < 1e-9
