"""Independent brute checks for wave-225 operators."""

import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave225 import (
    cramers_v,
    woe_iv,
)


def test_woe_iv_matches_definition_and_sign():
    goods = [100, 200, 300, 200, 100]
    bads = [50, 40, 30, 20, 10]
    rows, iv = woe_iv(goods, bads)
    G, B = sum(goods), sum(bads)
    ref_iv = 0.0
    for (band, g, b, woe), (gg, bb) in zip(rows,
                                           zip(goods, bads)):
        ref = math.log((gg / G) / (bb / B))
        assert abs(woe - ref) < 1e-12
        ref_iv += (gg / G - bb / B) * ref
    assert abs(iv - ref_iv) < 1e-12
    assert iv >= 0  # IV is nonnegative by construction
    # band 0 has relatively more bads -> negative WOE
    assert rows[0][3] < 0
    assert rows[4][3] > 0


def test_cramers_v_bounds_and_known_case():
    # perfect association in a 2x2 with balanced margins: V = 1
    # chi2 = N for a perfectly diagonal 2x2
    assert abs(cramers_v(100.0, 100, 2, 2) - 1.0) < 1e-12
    # independence: chi2 ~ 0 -> V ~ 0
    assert cramers_v(0.0, 1000, 5, 25) == 0.0
    v = cramers_v(37.2, 1500, 25, 5)
    assert 0 < v < 1
