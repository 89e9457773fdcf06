"""Independent brute checks for wave-190 multivariate tests."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave190 import (
    bartlett_from_moments,
    hotelling_from_moments,
)


def _moments(x, y):
    return (len(x), int(x.sum()), int(y.sum()),
            int((x * x).sum()), int((x * y).sum()),
            int((y * y).sum()))


def test_hotelling_matches_numpy_linear_algebra():
    rng = np.random.default_rng(91)
    for trial in range(8):
        n1 = int(rng.integers(30, 100))
        n2 = int(rng.integers(30, 100))
        x1 = rng.integers(1, 50, n1).astype(np.int64)
        y1 = rng.integers(100, 9000, n1).astype(np.int64)
        x2 = rng.integers(1, 50, n2).astype(np.int64)
        y2 = rng.integers(100, 9000, n2).astype(np.int64)
        t2, f = hotelling_from_moments(_moments(x1, y1),
                                       _moments(x2, y2))
        X1 = np.column_stack([x1, y1]).astype(float)
        X2 = np.column_stack([x2, y2]).astype(float)
        d = X1.mean(0) - X2.mean(0)
        S = (((n1 - 1) * np.cov(X1.T) + (n2 - 1) * np.cov(X2.T))
             / (n1 + n2 - 2))
        ref = (n1 * n2 / (n1 + n2)) * d @ np.linalg.inv(S) @ d
        assert abs(t2 - ref) < 1e-7 * max(1.0, abs(ref)), trial
        reff = ref * (n1 + n2 - 3) / (2 * (n1 + n2 - 2))
        assert abs(f - reff) < 1e-7 * max(1.0, abs(reff))


def test_bartlett_matches_direct_formula():
    rng = np.random.default_rng(92)
    groups = [rng.integers(0, 500, int(rng.integers(10, 60)))
              .astype(np.int64) for _ in range(6)]
    ns = [len(g) for g in groups]
    s1s = [int(g.sum()) for g in groups]
    s2s = [int((g * g).sum()) for g in groups]
    chi2, df = bartlett_from_moments(ns, s1s, s2s)
    # independent: textbook formula with numpy variances
    k = len(groups)
    N = sum(ns)
    vs = [g.var(ddof=1) for g in groups]
    sp2 = sum((n - 1) * v for n, v in zip(ns, vs)) / (N - k)
    num = (N - k) * np.log(sp2) - sum(
        (n - 1) * np.log(v) for n, v in zip(ns, vs))
    c = 1 + (sum(1 / (n - 1) for n in ns) - 1 / (N - k)) \
        / (3 * (k - 1))
    assert df == k - 1
    assert abs(chi2 - num / c) < 1e-8 * max(1.0, abs(num / c))
