"""Independent brute check for the wave-240 James-Stein shrink."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave240 import (
    james_stein,
)


def test_js_reduces_risk_on_simulated_means():
    rng = np.random.default_rng(581)
    k = 20
    theta = rng.normal(0, 50, k)  # true means
    mse_raw = []
    mse_js = []
    for _ in range(100):
        groups = [np.round(rng.normal(t, 200, 50)).astype(
            np.int64) for t in theta]
        ns = [len(g) for g in groups]
        s1s = [int(g.sum()) for g in groups]
        s2s = [int((g.astype(object) ** 2).sum())
               for g in groups]
        rows, c = james_stein(ns, s1s, s2s)
        raw = np.array([r[1] for r in rows])
        js = np.array([r[2] for r in rows])
        mse_raw.append(((raw - theta) ** 2).sum())
        mse_js.append(((js - theta) ** 2).sum())
        assert 0 <= c <= 1
    # Stein's paradox: shrinkage dominates the MLE
    assert np.mean(mse_js) < np.mean(mse_raw)


def test_js_formula_matches_direct():
    rng = np.random.default_rng(582)
    groups = [rng.integers(0, 1000, int(rng.integers(30, 90)))
              .astype(np.int64) for _ in range(8)]
    ns = [len(g) for g in groups]
    s1s = [int(g.sum()) for g in groups]
    s2s = [int((g * g).sum()) for g in groups]
    rows, c = james_stein(ns, s1s, s2s)
    means = np.array([g.mean() for g in groups])
    mbar = means.mean()
    pooled = sum(((g - g.mean()) ** 2).sum()
                 for g in groups) / sum(n - 1 for n in ns)
    vbar = np.mean([pooled / n for n in ns])
    s = ((means - mbar) ** 2).sum()
    cref = max(0, 1 - (8 - 3) * vbar / s)
    assert abs(c - cref) < 1e-9
    for (i, raw, js), m in zip(rows, means):
        assert abs(raw - m) < 1e-9
        assert abs(js - (mbar + cref * (m - mbar))) < 1e-7
