"""Independent brute checks for wave-206 operators."""

import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave206 import (
    ad_ksample,
    zm_fit,
)


def _brute_adk(samples):
    """Direct Scholz-Stephens A2akN from raw samples (midrank
    version, written from the paper's formula independently)."""
    pooled = np.concatenate(samples)
    N = len(pooled)
    zs = np.sort(np.unique(pooled))
    h = np.array([(pooled == z).sum() for z in zs], dtype=float)
    H = np.cumsum(h) - h / 2
    a2 = 0.0
    for x in samples:
        ni = len(x)
        Fi = np.array([(x < z).sum() + (x == z).sum() / 2
                       for z in zs])
        inner = 0.0
        for j in range(len(zs)):
            den = H[j] * (N - H[j]) - N * h[j] / 4
            if den > 0:
                inner += h[j] / N * (N * Fi[j]
                                     - ni * H[j]) ** 2 / den
        a2 += inner / ni
    return (N - 1) / N * a2


def test_ad_ksample_matches_paper_formula():
    rng = np.random.default_rng(251)
    for trial in range(6):
        samples = [rng.integers(0, 25, int(rng.integers(10, 40)))
                   for _ in range(4)]
        srcs, vals, cnts = [], [], []
        for i, x in enumerate(samples):
            uk, c = np.unique(x, return_counts=True)
            srcs.extend([f"s{i}"] * len(uk))
            vals.extend(int(v) for v in uk)
            cnts.extend(int(v) for v in c)
        a2, k, N = ad_ksample(srcs, vals, cnts)
        ref = _brute_adk(samples)
        assert k == 4 and N == sum(len(x) for x in samples)
        assert abs(a2 - ref) < 1e-9 * max(1.0, abs(ref)), trial


def test_zm_fit_recovers_known_law():
    s_true, q_true, c = 1.4, 7, 1e7
    freqs = [int(round(c / (r + 1 + q_true) ** s_true))
             for r in range(64)]
    qq, s, sse = zm_fit(freqs)
    assert abs(qq - q_true) <= 1
    assert abs(s - s_true) < 0.05
    assert sse < 1e-3


def test_zm_fit_slope_matches_polyfit():
    rng = np.random.default_rng(252)
    freqs = sorted((int(v) for v in rng.integers(100, 100000, 64)),
                   reverse=True)
    qq, s, sse = zm_fit(freqs)
    xs = np.log(np.arange(1, 65) + qq)
    ys = np.log(np.array(freqs, dtype=float))
    coef = np.polyfit(xs, ys, 1)
    assert abs(-s - coef[0]) < 1e-8
