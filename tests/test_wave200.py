"""Independent brute checks for wave-200 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave200 import (
    passing_bablok,
)


def test_passing_bablok_recovers_line_with_outliers():
    """PB is robust: a clean line plus a few gross outliers must
    still return the true slope/intercept (median-based)."""
    rng = np.random.default_rng(191)
    x = rng.integers(10, 500, 60).astype(np.int64)
    y = (3 * x + 7).astype(np.int64)
    y[:5] += rng.integers(1000, 5000, 5)
    N, k, b, a = passing_bablok(x, y)
    assert abs(b - 3.0) < 0.05
    assert abs(a - 7.0) < 30


def test_passing_bablok_median_selection_vs_numpy():
    rng = np.random.default_rng(192)
    for trial in range(6):
        n = int(rng.integers(10, 30))
        x = rng.integers(0, 100, n).astype(np.int64)
        y = rng.integers(0, 100, n).astype(np.int64)
        N, k, b, a = passing_bablok(x, y)
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                if x[j] != x[i]:
                    s = (int(y[j]) - int(y[i])) \
                        / (int(x[j]) - int(x[i]))
                    if s != -1.0:
                        slopes.append(s)
        slopes = np.sort(np.array(slopes))
        kk = int((slopes < -1).sum())
        assert N == len(slopes) and k == kk
        if N % 2 == 1:
            ref = slopes[(N + 1) // 2 + kk - 1]
        else:
            ref = (slopes[N // 2 + kk - 1]
                   + slopes[N // 2 + kk]) / 2
        assert b == ref, trial


def test_recursive_residuals_match_per_step_polyfit():
    rng = np.random.default_rng(193)
    t = np.arange(1, 30, dtype=np.int64)
    y = (1000 + 55 * t + rng.integers(-40, 40, 29)).astype(
        np.int64)
    # engine-style streaming
    ws = []
    cn = 0
    sx = sy = sxx = sxy = 0
    for tt, yy in zip(t, y):
        tt, yy = int(tt), int(yy)
        if cn >= 2:
            fn = float(cn)
            b = (fn * sxy - sx * sy) / (fn * sxx - sx * sx)
            a = (sy - b * sx) / fn
            xbar = sx / cn
            sxxc = sxx - sx * sx / fn
            h = 1 + 1 / fn + (tt - xbar) ** 2 / sxxc
            ws.append((yy - a - b * tt) / np.sqrt(h))
        cn += 1
        sx += tt
        sy += yy
        sxx += tt * tt
        sxy += tt * yy
    # brute per-step polyfit
    for i, r in enumerate(range(3, len(t) + 1)):
        tp = t[: r - 1].astype(float)
        yp = y[: r - 1].astype(float)
        coef = np.polyfit(tp, yp, 1)
        pred = coef[1] + coef[0] * t[r - 1]
        n1 = len(tp)
        h = 1 + 1 / n1 + (t[r - 1] - tp.mean()) ** 2 \
            / ((tp - tp.mean()) ** 2).sum()
        ref = (y[r - 1] - pred) / np.sqrt(h)
        assert abs(ws[i] - ref) < 1e-8, r
