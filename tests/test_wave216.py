"""Independent brute checks for wave-216 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave216 import (
    dixon_q,
    sup_wald,
)


def test_sup_wald_finds_injected_break():
    rng = np.random.default_rng(351)
    y = np.concatenate([rng.normal(1000, 30, 50),
                        rng.normal(1400, 30, 50)])
    y = np.round(y).astype(np.int64)
    tau, f = sup_wald(list(y))
    assert 45 <= tau <= 55
    assert f > 100
    # brute F at the true break equals the two-sample pooled F
    a, b = y[:50].astype(float), y[50:].astype(float)
    ssr0 = ((y - y.mean()) ** 2).sum()
    s = ((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()
    f50 = (ssr0 - s) / (s / (len(y) - 2))
    assert f >= f50 - 1e-9


def test_sup_wald_matches_numpy_scan():
    rng = np.random.default_rng(352)
    y = np.round(rng.normal(500, 40, 60)).astype(np.int64)
    tau, f = sup_wald(list(y))
    T = len(y)
    best = (-1.0, None)
    ssr0 = ((y - y.mean()) ** 2).sum()
    for t in range((15 * T + 99) // 100, (85 * T) // 100 + 1):
        a, b = y[:t].astype(float), y[t:].astype(float)
        s = ((a - a.mean()) ** 2).sum() \
            + ((b - b.mean()) ** 2).sum()
        ff = (ssr0 - s) / (s / (T - 2))
        if ff > best[0] + 1e-12:
            best = (ff, t)
    assert tau == best[1]
    assert abs(f - best[0]) < 1e-6


def test_dixon_q_flags_outlier_group():
    ns = [10] * 10
    s1s = [1000 + 5 * i for i in range(9)] + [5000]
    ql, qh = dixon_q(ns, s1s)
    means = sorted(s / n for s, n in zip(s1s, ns))
    ref_qh = (means[-1] - means[-2]) / (means[-1] - means[0])
    assert abs(qh - ref_qh) < 1e-12
    assert qh > 0.9
