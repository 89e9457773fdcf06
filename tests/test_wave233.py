"""Independent brute check for the wave-233 Dunn post-hoc test."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave233 import (
    dunn_pairs,
)


def test_dunn_matches_per_rank_brute():
    rng = np.random.default_rng(511)
    groups = {
        "a": rng.integers(0, 30, 40),
        "b": rng.integers(10, 40, 35),
        "c": rng.integers(0, 30, 45),
    }
    srcs, vals, cnts = [], [], []
    for s, x in groups.items():
        uk, c = np.unique(x, return_counts=True)
        srcs.extend([s] * len(uk))
        vals.extend(int(v) for v in uk)
        cnts.extend(int(v) for v in c)
    rows = dunn_pairs(srcs, vals, cnts)
    # brute: midranks over the pooled sample
    pooled = np.concatenate(list(groups.values()))
    order = np.argsort(pooled, kind="stable")
    n = len(pooled)
    r = np.empty(n)
    sv = pooled[order]
    i = 0
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        r[i:j] = (i + 1 + j) / 2
        i = j
    ranks = np.empty(n)
    ranks[order] = r
    bounds = np.cumsum([0] + [len(x) for x in groups.values()])
    means = {}
    for k, s in enumerate(groups):
        means[s] = ranks[bounds[k]: bounds[k + 1]].mean()
    _, t = np.unique(pooled, return_counts=True)
    base = n * (n + 1) / 12 - (t**3 - t).sum() / (12 * (n - 1))
    got = {(a, b): z for a, b, z in rows}
    for (a, b), z in got.items():
        var = base * (1 / len(groups[a]) + 1 / len(groups[b]))
        ref = (means[a] - means[b]) / np.sqrt(var)
        assert abs(z - ref) < 1e-9, (a, b)
    # group b is shifted up -> (a,b) and (b,c) pairs dominate
    top = rows[0]
    assert "b" in (top[0], top[1])
