"""Independent brute checks for wave-193 OR operators."""

import itertools

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave193 import (
    ss_replay,
    wagner_whitin,
)


def test_ss_replay_invariants_and_alt_sim():
    rng = np.random.default_rng(121)
    for trial in range(10):
        d = rng.integers(0, 200, 40).astype(np.int64)
        s = int(d.sum() // d.size)
        S = 2 * s
        n_orders, ordered, stockouts, stock = ss_replay(d, s, S)
        # alternate simulator written independently
        inv = S
        orders2 = 0
        qty2 = 0
        so2 = 0
        for dv in d:
            inv = inv - int(dv)
            if inv < 0:
                so2 += 1
            if inv < s:
                qty2 += S - inv
                orders2 += 1
                inv = S
        assert (n_orders, ordered, stockouts, stock) == \
            (orders2, qty2, so2, inv)
        # conservation: final stock = S start + ordered - demand
        assert stock == S + ordered - int(d.sum())


def _brute_ww(d, K=1000, h=1):
    T = len(d)
    best = None
    for mask in itertools.product([0, 1], repeat=T - 1):
        orders = [0] + [i + 1 for i, b in enumerate(mask) if b]
        cost = K * len(orders)
        last = 0
        for t in range(T):
            if t in orders:
                last = t
            cost += h * (t - last) * int(d[t])
        if best is None or cost < best:
            best = cost
    return best


def test_wagner_whitin_matches_subset_enumeration():
    rng = np.random.default_rng(122)
    for trial in range(5):
        d = rng.integers(0, 500, 10).astype(np.int64)
        f = wagner_whitin(d)
        assert f[len(d)] == _brute_ww(list(d)), trial
