"""Independent brute checks for wave-194 operators."""

import math

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave194 import (
    TYPE_BITS,
    link_scores,
)


def test_link_scores_match_per_user_brute():
    rng = np.random.default_rng(131)
    types = sorted(TYPE_BITS)
    users = []
    for _ in range(200):
        k = int(rng.integers(1, 6))
        users.append(set(rng.choice(types, k, replace=False)))
    mask_counts = {}
    for s in users:
        m = sum(TYPE_BITS[t] for t in s)
        mask_counts[m] = mask_counts.get(m, 0) + 1
    rows = {(r[0], r[1]): r for r in link_scores(mask_counts)}
    for i in range(5):
        for j in range(i + 1, 5):
            a, b = types[i], types[j]
            both = [u for u in users if a in u and b in u]
            common = len(both)
            aa = sum(1 / math.log(len(u)) for u in both)
            ra = sum(1 / len(u) for u in both)
            got = rows[(a, b)]
            assert got[2] == common, (a, b)
            assert abs(got[3] - aa) < 1e-9, (a, b)
            assert abs(got[4] - ra) < 1e-9, (a, b)


def test_contingency_chi2_matches_outer_product():
    rng = np.random.default_rng(132)
    m = rng.integers(0, 40, (6, 4)).astype(np.int64)
    N = int(m.sum())
    rt = m.sum(1)
    ct = m.sum(0)
    chi2 = 0.0
    for r in range(6):
        for c in range(4):
            e = int(rt[r]) * int(ct[c]) / N
            chi2 += (int(m[r, c]) - e) ** 2 / e
    # independent via matrix identity: chi2 = N*(sum o^2/(rt*ct) - 1)
    alt = N * (sum(int(m[r, c]) ** 2
                   / (int(rt[r]) * int(ct[c]))
                   for r in range(6) for c in range(4)) - 1)
    assert abs(chi2 - alt) < 1e-8 * max(1.0, chi2)
