"""Independent brute checks for wave-208 signal features."""

import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave208 import (
    H0,
    H1,
    H2,
    H3,
    db4_energies,
    katz_fd,
)


def test_db4_filters_are_orthonormal_qmf():
    assert abs(H0**2 + H1**2 + H2**2 + H3**2 - 1.0) < 1e-12
    assert abs(H0 * H2 + H1 * H3) < 1e-12  # shift-2 orthogonality
    g = [H3, -H2, H1, -H0]
    assert abs(sum(g)) < 1e-12  # detail filter kills constants
    # detail filter kills linear ramps (db4 has 2 vanishing moments)
    assert abs(sum(i * c for i, c in enumerate(g))) < 1e-12


def test_db4_energy_zero_on_linear_series():
    s = [int(7 * i + 3) for i in range(40)]
    e1, e2 = db4_energies(s)
    assert e1 < 1e-12
    assert e2 < 1e-6


def test_db4_energy_matches_direct_convolution():
    rng = np.random.default_rng(271)
    s = [int(v) for v in rng.integers(0, 5000, 50)]
    e1, e2 = db4_energies(s)
    h = np.array([H0, H1, H2, H3])
    g = np.array([H3, -H2, H1, -H0])
    x = np.array(s, dtype=float)
    n1 = (len(x) - 2) // 2
    d1 = np.array([g @ x[2 * k: 2 * k + 4] for k in range(n1)])
    a1 = np.array([h @ x[2 * k: 2 * k + 4] for k in range(n1)])
    assert abs(e1 - (d1**2).sum()) < 1e-6
    n2 = (len(a1) - 2) // 2
    d2 = np.array([g @ a1[2 * k: 2 * k + 4] for k in range(n2)])
    assert abs(e2 - (d2**2).sum()) < 1e-6


def test_katz_fd_known_cases():
    # straight line: d == L -> FD = 1
    s = list(range(0, 100, 3))
    L, d, fd = katz_fd(s)
    assert L == d and abs(fd - 1.0) < 1e-12
    # oscillating series: L >> d -> FD > 1
    s2 = [0, 10, 0, 10, 0, 10, 0, 10, 1]
    L2, d2, fd2 = katz_fd(s2)
    assert fd2 > 1.0
    m = len(s2) - 1
    ref = math.log10(m) / (math.log10(m)
                           + math.log10(d2 / L2))
    assert abs(fd2 - ref) < 1e-15
