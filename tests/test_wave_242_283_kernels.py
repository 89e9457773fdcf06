"""Kernel-level tests for the wave 242-283 statistics (no Ray needed).

Each test re-asserts the strongest independent check from the wave's
commit-time verification: textbook/paper anchors, brute-force
replays, and structural identities.
"""

import math

import numpy as np
import pytest


def test_brunner_munzel_paper_example():
    from anofox_forecast_ray.pipelines.queries_wave246 import (
        brunner_munzel_from_hist)

    x = [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1]
    y = [3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4]
    vals = sorted(set(x) | set(y))
    c0 = np.array([x.count(v) for v in vals], dtype=np.int64)
    c1 = np.array([y.count(v) for v in vals], dtype=np.int64)
    n1, n2, p_hat, w, df = brunner_munzel_from_hist(c0, c1)
    assert abs(p_hat - 0.788961) < 5e-7
    assert abs(w - 3.1375) < 5e-5
    assert abs(df - 17.683) < 5e-4


def test_lz76_matches_kaspar_schuster():
    from anofox_forecast_ray.pipelines.queries_wave249 import lz76

    def ks(s):
        n = len(s)
        if n <= 1:
            return n
        c, l, i, k, kmax = 1, 1, 0, 1, 1
        while True:
            if s[i + k - 1] == s[l + k - 1]:
                k += 1
                if l + k > n:
                    return c + 1
            else:
                kmax = max(k, kmax)
                i += 1
                if i == l:
                    c += 1
                    l += kmax
                    if l + 1 > n:
                        return c
                    i, k, kmax = 0, 1, 1
                else:
                    k = 1

    rng = np.random.default_rng(1)
    for _ in range(100):
        s = "".join(rng.choice(["0", "1"],
                               size=int(rng.integers(1, 60))))
        assert lz76(s)[1] == ks(s)


def test_hoeffding_d_monotone_invariance_and_max():
    from anofox_forecast_ray.pipelines.queries_wave244 import (
        hoeffding_d)

    rng = np.random.default_rng(2)
    x = rng.permutation(40).tolist()
    _, d_lin = hoeffding_d(x, x)
    _, d_cub = hoeffding_d(x, [v ** 3 for v in x])
    assert d_lin == d_cub
    assert d_lin > 0.8


def test_energy_changepoint_cdf_identity():
    from anofox_forecast_ray.pipelines.queries_wave257 import (
        energy_changepoint)

    rng = np.random.default_rng(3)
    x = (list(rng.integers(5, 9, size=12))
         + list(rng.integers(25, 30, size=10)))
    tau, n1, q, ml, mr = energy_changepoint([int(v) for v in x])
    assert tau == 12
    assert mr > ml + 10


def test_huffman_equals_heapq_and_bounds():
    import heapq

    from anofox_forecast_ray.pipelines.queries_wave258 import (
        huffman_cost)

    rng = np.random.default_rng(4)
    for _ in range(30):
        w = rng.integers(1, 500,
                         size=int(rng.integers(2, 20))).tolist()
        bits, h = huffman_cost(w)
        heap = list(w)
        heapq.heapify(heap)
        acc = 0
        while len(heap) > 1:
            a = heapq.heappop(heap)
            b = heapq.heappop(heap)
            acc += a + b
            heapq.heappush(heap, a + b)
        assert bits == acc
        assert h - 1e-9 <= bits < h + sum(w)


def test_jaro_winkler_matches_duckdb():
    import duckdb

    from anofox_forecast_ray.pipelines.queries_wave260 import (
        jaro_winkler, levenshtein)

    con = duckdb.connect()
    rng = np.random.default_rng(5)
    for _ in range(300):
        a = "".join(rng.choice(list("ab01"),
                               size=int(rng.integers(0, 12))))
        b = "".join(rng.choice(list("ab01"),
                               size=int(rng.integers(0, 12))))
        jw, lv = con.execute(
            "SELECT jaro_winkler_similarity(?, ?), "
            "levenshtein(?, ?)", [a, b, a, b]).fetchone()
        assert jaro_winkler(a, b) == jw
        assert levenshtein(a, b) == lv


def test_markov_attribution_properties():
    from anofox_forecast_ray.pipelines.queries_wave269 import (
        CONV, NULL, markov_attribution)

    counts = {(0, 1): 60, (1, CONV): 60, (0, 4): 40, (4, NULL): 40}
    rows = markov_attribution(counts)
    d = {r[0]: r for r in rows}
    assert abs(d["click"][3] - 1.0) < 1e-9
    assert abs(d["view"][3]) < 1e-9
    assert abs(sum(r[4] for r in rows) - 1.0) < 1e-12


def test_bocpd_matches_lgamma_reference():
    from anofox_forecast_ray.pipelines.queries_wave282 import bocpd

    rng = np.random.default_rng(6)
    x = (rng.poisson(8, size=15).tolist()
         + rng.poisson(45, size=10).tolist())
    mr, mp, prc = bocpd(x)

    pre = np.concatenate([[0], np.cumsum(x)])
    p = np.array([1.0])
    for t in range(1, len(x) + 1):
        xt = x[t - 1]
        preds = np.empty(t)
        for r in range(t):
            s = pre[t - 1] - pre[t - 1 - r]
            a, b = 1 + s, 1 + r
            lp = (math.lgamma(xt + a) - math.lgamma(a)
                  - math.lgamma(xt + 1)
                  + a * math.log(b / (b + 1))
                  + xt * math.log(1 / (b + 1)))
            preds[r] = math.exp(lp)
        w = p * preds
        new = np.concatenate([[w.sum() * 0.1], w * 0.9])
        p = new / new.sum()
    assert mr == int(np.argmax(p))
    assert abs(mp - p.max()) < 1e-9
    assert mr <= 11  # run length reset after the level shift


def test_lundberg_root_property():
    from anofox_forecast_ray.pipelines.queries_wave280 import (
        lundberg)

    rng = np.random.default_rng(7)
    x = rng.poisson(20, size=40).tolist()
    c, r, bound = lundberg(x)
    f = np.mean(np.exp(r * (np.array(x, float) - c))) - 1.0
    assert abs(f) < 1e-6
    assert 0 < bound < 1


def test_participation_ratio_rank1_vs_isotropic():
    import anofox_forecast_ray.pipelines.queries_wave278 as m

    rng = np.random.default_rng(8)
    old = m.DIM
    try:
        m.DIM = 6
        X = rng.normal(size=(2000, 6))
        _, _, pr_iso = m.participation_ratio(X.tolist())
        v = rng.normal(size=6)
        X1 = (np.outer(rng.normal(size=2000), v)
              + 0.01 * rng.normal(size=(2000, 6)))
        _, _, pr_r1 = m.participation_ratio(X1.tolist())
        assert pr_iso > 5.5
        assert pr_r1 < 1.3
    finally:
        m.DIM = old


def test_procrustes_rotation_recovery():
    from anofox_forecast_ray.pipelines.queries_wave283 import (
        procrustes_2d)

    rng = np.random.default_rng(9)
    A = rng.normal(size=(10, 2))
    th_true = 1.1
    R = np.array([[np.cos(th_true), -np.sin(th_true)],
                  [np.sin(th_true), np.cos(th_true)]])
    B = 1.5 * (A @ R.T) + np.array([3.0, -2.0])
    th, s, disp = procrustes_2d([tuple(r) for r in A],
                                [tuple(r) for r in B])
    assert abs(th - th_true) < 1e-9
    assert abs(s - 1.5) < 1e-9
    assert disp < 1e-12
