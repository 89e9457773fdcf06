"""Independent brute checks for wave-221 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave221 import (
    BOOT_B,
    bootstrap_means,
    tukey_pairs,
)


def test_tukey_q_matches_numpy():
    rng = np.random.default_rng(401)
    groups = [rng.integers(0, 1000, int(rng.integers(50, 200)))
              .astype(np.int64) for _ in range(4)]
    ns = [len(g) for g in groups]
    s1s = [int(g.sum()) for g in groups]
    s2s = [int((g * g).sum()) for g in groups]
    rows = tukey_pairs(ns, s1s, s2s)
    N = sum(ns)
    sse = sum(((g - g.mean()) ** 2).sum() for g in groups)
    mse = sse / (N - 4)
    for i, j, q in rows:
        ref = abs(groups[i].mean() - groups[j].mean()) / np.sqrt(
            mse / 2 * (1 / ns[i] + 1 / ns[j]))
        assert abs(q - ref) < 1e-9 * max(1.0, ref), (i, j)


def test_bootstrap_sums_deterministic_and_centered():
    rng = np.random.default_rng(402)
    y = [int(v) for v in rng.integers(1000, 5000, 80)]
    a = bootstrap_means(y)
    b = bootstrap_means(y)
    assert a == b  # sha-seeded: fully deterministic
    means = np.array([s / len(y) for _, s in a])
    assert abs(means.mean() - np.mean(y)) < np.std(y)
    # CI brackets the sample mean for a well-behaved sample
    vals = np.sort(means)
    assert vals[3] <= np.mean(y) <= vals[59]
