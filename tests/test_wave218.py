"""Independent brute checks for wave-218 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave218 import (
    mann_kendall,
)


def test_mann_kendall_matches_textbook():
    rng = np.random.default_rng(371)
    x = rng.integers(0, 10, 40)
    s, var_num, z, sen = mann_kendall(list(x))
    # brute S
    bs = 0
    slopes = []
    for i in range(40):
        for j in range(i + 1, 40):
            bs += int(np.sign(int(x[j]) - int(x[i])))
            slopes.append((int(x[j]) - int(x[i])) / (j - i))
    assert s == bs
    assert abs(sen - float(np.median(slopes))) < 1e-12
    # variance with ties (textbook)
    n = 40
    _, t = np.unique(x, return_counts=True)
    ref = n * (n - 1) * (2 * n + 5) \
        - int((t * (t - 1) * (2 * t + 5)).sum())
    assert var_num == ref
    zref = (bs - np.sign(bs)) / np.sqrt(ref / 18)
    assert abs(z - zref) < 1e-12


def test_mann_kendall_detects_trend():
    x = list(range(0, 120, 3))
    s, var_num, z, sen = mann_kendall(x)
    assert z > 5
    assert abs(sen - 3.0) < 1e-12
