"""Independent brute checks for wave-219 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave219 import (
    greenwood,
    runs_updown,
)


def test_greenwood_uniform_vs_clumped():
    # perfectly even spacings minimize G at 1/n
    even = [10] * 100
    n, s1, s2, g = greenwood(even)
    assert abs(g - 1 / 100) < 1e-12
    # one giant gap drives G toward 1
    clumped = [1] * 99 + [100000]
    _, _, _, g2 = greenwood(clumped)
    assert g2 > 0.9
    # numpy cross-check
    rng = np.random.default_rng(381)
    gaps = rng.integers(1, 50, 200)
    _, _, _, g3 = greenwood(list(gaps))
    ref = (gaps.astype(float) ** 2).sum() / gaps.sum() ** 2
    assert abs(g3 - ref) < 1e-12


def test_runs_updown_alternating_and_monotone():
    # strictly alternating: every diff flips -> r = m - 1 + 1
    x = [1, 5, 1, 5, 1, 5, 1, 5, 1]
    m, r, z = runs_updown(x)
    assert m == 9 and r == 8
    assert z > 2
    # monotone: single run
    m2, r2, z2 = runs_updown(list(range(12)))
    assert r2 == 1
    assert z2 < -2


def test_runs_updown_drops_zero_diffs():
    x = [3, 3, 4, 4, 2, 2, 5]
    # diffs: 0, +, 0, -, 0, + -> signs [+,-,+] -> r = 3, m = 4
    m, r, z = runs_updown(x)
    assert m == 4 and r == 3
