"""Independent brute checks for wave-228 ordinal measures."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave228 import (
    somers_gamma,
    uncertainty_coeff,
)


def test_somers_gamma_matches_per_pair_brute():
    rng = np.random.default_rng(461)
    x = rng.integers(0, 6, 120)
    y = rng.integers(0, 3, 120)
    cells = {}
    for a, b in zip(x, y):
        cells[(int(a), int(b))] = cells.get((int(a), int(b)),
                                            0) + 1
    C, D, ty, gamma, dd = somers_gamma(cells)
    bc = bd = bt = 0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            dx = int(x[j]) - int(x[i])
            dy = int(y[j]) - int(y[i])
            if dx != 0 and dy != 0:
                if dx * dy > 0:
                    bc += 1
                else:
                    bd += 1
            elif dy == 0 and dx != 0:
                bt += 1
    assert (C, D, ty) == (bc, bd, bt)
    assert abs(gamma - (bc - bd) / (bc + bd)) < 1e-12
    assert abs(dd - (bc - bd) / (bc + bd + bt)) < 1e-12


def test_uncertainty_coeff_bounds_and_perfect():
    # perfect prediction: U = 1
    cells = {(h, h % 3): 10 for h in range(9)}
    mi, hy, u = uncertainty_coeff(cells)
    assert abs(u - 1.0) < 1e-12
    # independence: U ~ 0
    cells2 = {(h, y): 10 for h in range(6) for y in range(3)}
    mi2, hy2, u2 = uncertainty_coeff(cells2)
    assert abs(u2) < 1e-12
