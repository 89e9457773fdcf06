"""Independent brute checks for wave-202 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave202 import (
    CLASSES,
    markov_mixing,
    stuart_maxwell,
)


def test_stuart_maxwell_matches_matrix_form():
    rng = np.random.default_rng(211)
    for trial in range(10):
        m = rng.integers(0, 60, (3, 3)).astype(np.int64)
        counts = {(CLASSES[i], CLASSES[j]): int(m[i, j])
                  for i in range(3) for j in range(3)
                  if m[i, j] > 0}
        num, den, chi2 = stuart_maxwell(counts)
        row = m.sum(1)
        col = m.sum(0)
        d = (row - col)[:2].astype(float)
        V = np.zeros((2, 2))
        for i in range(2):
            V[i, i] = row[i] + col[i] - 2 * m[i, i]
        V[0, 1] = V[1, 0] = -(m[0, 1] + m[1, 0])
        ref = d @ np.linalg.inv(V) @ d
        assert abs(chi2 - ref) < 1e-9 * max(1.0, ref), trial


def test_stuart_maxwell_zero_on_symmetric():
    m = np.array([[5, 7, 2], [7, 4, 3], [2, 3, 9]])
    counts = {(CLASSES[i], CLASSES[j]): int(m[i, j])
              for i in range(3) for j in range(3)}
    num, den, chi2 = stuart_maxwell(counts)
    assert num == 0 and chi2 == 0.0


def test_markov_mixing_decreases_to_stationary():
    """For an ergodic chain started at a point mass, TV to the
    to-state frequency distribution shrinks with k, and matches a
    numpy matrix-power computation."""
    rng = np.random.default_rng(212)
    m = rng.integers(5, 60, (3, 3)).astype(np.int64)
    counts = {(CLASSES[i], CLASSES[j]): int(m[i, j])
              for i in range(3) for j in range(3)}
    out = markov_mixing(counts, CLASSES)
    P = m.astype(float) / m.sum(1, keepdims=True)
    pi = m.sum(0).astype(float) / m.sum()
    rho = np.array([1.0, 0.0, 0.0])
    for k, tv in out:
        rho = rho @ P
        ref = 0.5 * np.abs(rho - pi).sum()
        assert abs(tv - ref) < 1e-12, k
    assert out[-1][1] <= out[0][1] + 1e-12
