"""Independent brute checks for wave-205 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave205 import (
    erlang_c,
    zeta_top,
)


def test_zeta_top_matches_float_sort_when_unambiguous():
    rng = np.random.default_rng(241)
    n0, n1 = 40, 50
    dc = {}
    for t in range(200):
        dc[t] = (int(rng.integers(0, n0 + 1)),
                 int(rng.integers(0, n1 + 1)))
    rows = zeta_top(dc, n0, n1)
    # brute: sort by float zeta desc, token asc
    brute = sorted(dc.items(),
                   key=lambda kv: (-(kv[1][0] / n0
                                     - kv[1][1] / n1), kv[0]))
    for (t, fa, fb, z), (bt, (c0, c1)) in zip(rows, brute[:10]):
        # integer-key and float orderings agree except on exact
        # rational ties, which the integer key breaks correctly
        assert abs(z - (c0 / n0 - c1 / n1)) < 1e-12 or t == bt


def test_erlang_c_against_direct_formula():
    """Erlang B recursion must equal the closed form
    B = (a^c/c!) / sum a^k/k!, and C = B/(1-rho(1-B))."""
    import math

    for lam, mu, c in [(50.0, 12.0, 10), (80.0, 12.0, 10),
                       (30.0, 12.0, 5)]:
        a, cc, wq = erlang_c(lam, mu, c)
        terms = [a**k / math.factorial(k) for k in range(c + 1)]
        b_ref = terms[-1] / sum(terms)
        rho = a / c
        c_ref = b_ref / (1 - rho * (1 - b_ref))
        assert abs(cc - c_ref) < 1e-10, (lam, c)
        assert abs(wq - c_ref / (c * mu - lam)) < 1e-12


def test_erlang_c_exceeds_erlang_b():
    a, cc, _ = erlang_c(60.0, 12.0, 10)
    b = 1.0
    for k in range(1, 11):
        b = (60.0 / 12.0) * b / (k + (60.0 / 12.0) * b)
    assert cc >= b  # delay prob >= loss prob always
