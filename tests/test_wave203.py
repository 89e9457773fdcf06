"""Independent brute checks for wave-203 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave203 import (
    cusumsq,
    kde_grid,
)


def test_cusumsq_flags_variance_break():
    rng = np.random.default_rng(221)
    w = np.concatenate([rng.normal(0, 1, 40),
                        rng.normal(0, 6, 40)])
    T, max_dev, arg = cusumsq(list(w))
    # deviation must peak near the break and be large
    assert max_dev > 0.2
    assert 25 <= arg <= 55
    # stable series: small deviation
    w2 = rng.normal(0, 1, 80)
    _, md2, _ = cusumsq(list(w2))
    assert md2 < max_dev


def test_cusumsq_matches_numpy_cumsum():
    rng = np.random.default_rng(222)
    w = rng.normal(0, 1, 50)
    T, max_dev, arg = cusumsq(list(w))
    s = np.cumsum(w**2) / (w**2).sum()
    line = np.arange(1, 51) / 50
    dev = np.abs(s - line)
    assert abs(max_dev - dev.max()) < 1e-12
    assert arg == int(dev.argmax()) + 1


def test_kde_matches_scipy_style_brute():
    rng = np.random.default_rng(223)
    vals = list(range(100, 200, 5))
    cnts = [int(c) for c in rng.integers(1, 30, len(vals))]
    grid, dens = kde_grid(vals, cnts, vals[0], vals[-1])
    n = sum(cnts)
    h = (vals[-1] - vals[0]) / 16
    x = np.repeat(vals, cnts).astype(float)
    for g, d in zip(grid[::7], dens[::7]):
        ref = np.exp(-0.5 * ((g - x) / h) ** 2).sum() \
            / (n * h * np.sqrt(2 * np.pi))
        assert abs(d - ref) < 1e-10 * max(1e-12, ref)
