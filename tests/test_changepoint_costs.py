"""PELT cost-function suite: each of the 8 segment costs
(src/changepoint/cost.rs:38-264) must recover the changepoint its cost is
designed for, and prefix-sum O(1) evaluations must match direct
recomputation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from anofox_forecast_ray.kernels.changepoint import _COSTS, pelt_detect


def _near(cps, target, tol=3):
    return any(abs(c - target) <= tol for c in cps)


def test_poisson_rate_change():
    rng = np.random.default_rng(42)
    y = np.concatenate([rng.poisson(2.0, 60), rng.poisson(10.0, 60)]).astype(
        float
    )
    cps = pelt_detect(y, cost="poisson")
    assert _near(cps, 60), cps


def test_linear_trend_slope_change():
    # continuous piecewise-linear: mean-based costs are blind to pure
    # slope breaks, linear_trend is not
    i = np.arange(120, dtype=float)
    y = np.where(i < 60, 0.5 * i, 30.0 + 3.0 * (i - 60))
    rng = np.random.default_rng(1)
    y = y + rng.normal(0, 0.5, y.size)
    cps = pelt_detect(y, cost="linear_trend", penalty=10.0)
    assert _near(cps, 60), cps


def test_mean_variance_detects_variance_change():
    rng = np.random.default_rng(7)
    y = np.concatenate(
        [rng.normal(10.0, 0.5, 80), rng.normal(10.0, 6.0, 80)]
    )
    cps = pelt_detect(y, cost="mean_variance")
    assert _near(cps, 80), cps


def test_cusum_sustained_shift():
    rng = np.random.default_rng(3)
    y = np.concatenate(
        [rng.normal(0.0, 1.0, 70), rng.normal(4.0, 1.0, 70)]
    )
    cps = pelt_detect(y, cost="cusum", penalty=8.0)
    assert _near(cps, 70), cps


def test_periodicity_pattern_change():
    i = np.arange(128, dtype=float)
    first = 10.0 * np.sin(2 * np.pi * i[:64] / 8.0)
    # second half: different period AND phase-incoherent amplitude jumps
    rng = np.random.default_rng(5)
    second = 10.0 * np.sign(np.sin(2 * np.pi * i[64:] / 5.0)) + rng.normal(
        0, 2.0, 64
    )
    y = np.concatenate([first, second])
    cps = pelt_detect(y, cost="periodicity", penalty=50.0,
                      min_segment_length=16)
    assert _near(cps, 64, tol=8), cps


def test_flat_series_no_changepoints():
    flat = np.full(100, 5.0)
    for cost in _COSTS:
        assert pelt_detect(flat, cost=cost) == [], cost


@pytest.mark.parametrize("cost", ["poisson", "linear_trend",
                                  "mean_variance", "cusum"])
def test_prefix_costs_match_direct(cost):
    """O(1) prefix-sum evaluation == direct recomputation on the raw
    slice (guards index-offset bugs, esp. linear_trend's local-x shift)."""
    rng = np.random.default_rng(11)
    y = np.abs(rng.normal(5.0, 2.0, 200)) + 1.0
    c = _COSTS[cost](y)
    for s, e in [(0, 200), (13, 57), (57, 61), (150, 200), (0, 2)]:
        seg = y[s:e]
        n = seg.size
        if cost == "poisson":
            mean = seg.sum() / n
            want = seg.sum() - seg.sum() * math.log(mean)
        elif cost == "linear_trend":
            x = np.arange(n, dtype=float)
            A = np.column_stack([np.ones(n), x])
            beta, *_ = np.linalg.lstsq(A, seg, rcond=None)
            want = float(((seg - A @ beta) ** 2).sum())
        elif cost == "mean_variance":
            var = seg.var()
            want = 0.0 if n < 2 or var < 1e-10 else n * (1 + math.log(var))
        else:  # cusum
            want = (0.0 if n < 2
                    else float(np.abs(np.cumsum(seg - seg.mean())).max()))
        got = c.cost(s, e)
        assert got == pytest.approx(want, rel=1e-8, abs=1e-8), (cost, s, e)


def test_l1_outlier_robustness():
    y = np.concatenate([np.full(50, 10.0), np.full(50, 20.0)])
    y[25] = 500.0  # single outlier must not create a changepoint pair
    cps = pelt_detect(y, cost="l1")
    assert _near(cps, 50, tol=1), cps
