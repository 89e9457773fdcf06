"""Independent brute checks for wave-223 information measures."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave223 import (
    active_info,
    transfer_entropy,
)


def test_transfer_entropy_detects_coupling():
    rng = np.random.default_rng(421)
    n = 4000
    p = np.round(np.cumsum(rng.choice([-3, 3], n))
                 + rng.normal(0, 0.1, n)).astype(np.int64)
    # e follows p's moves with one day lag -> TE(P->E) large
    e = np.zeros(n, dtype=np.int64)
    e[0] = 100
    for t in range(1, n):
        up = 3 if (t >= 2 and p[t - 1] > p[t - 2]) else -3
        e[t] = e[t - 1] + up
    _, te_coupled = transfer_entropy(list(e), list(p))
    # independent chains -> TE near 0
    e2 = np.round(np.cumsum(rng.choice([-3, 3], n))).astype(
        np.int64)
    _, te_null = transfer_entropy(list(e2), list(p))
    assert te_coupled > 0.5
    assert te_null < 0.05
    assert te_coupled > te_null


def test_ais_matches_mi_definition():
    rng = np.random.default_rng(422)
    x = np.round(np.cumsum(rng.choice([-1, 2], 2000))).astype(
        np.int64)
    n, ais = active_info(list(x))
    # brute MI over the binary chain
    a = [1 if int(x[i]) > int(x[i - 1]) else 0
         for i in range(1, len(x))]
    import collections

    joint = collections.Counter(zip(a[1:], a[:-1]))
    nn = len(a) - 1
    prev = collections.Counter(a[:-1])
    nxt = collections.Counter(a[1:])
    mi = 0.0
    for (e2, e1), c in sorted(joint.items()):
        mi += c / nn * np.log2(c * nn / (nxt[e2] * prev[e1]))
    assert abs(ais - mi) < 1e-12
    assert ais >= -1e-12
