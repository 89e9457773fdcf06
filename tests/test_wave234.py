"""Independent brute check for the wave-234 records law."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave234 import (
    record_stats,
)


def test_record_counts_known_cases():
    # strictly increasing: every day a record high, one low
    nh, nl, last, hn = record_stats(list(range(10)))
    assert nh == 10 and nl == 1 and last == 9
    assert abs(hn - sum(1 / k for k in range(1, 11))) < 1e-12
    # strictly decreasing: one high, all lows
    nh2, nl2, last2, _ = record_stats(list(range(10, 0, -1)))
    assert nh2 == 1 and nl2 == 10 and last2 == 0


def test_record_counts_near_harmonic_for_iid():
    rng = np.random.default_rng(521)
    counts = []
    for _ in range(200):
        x = rng.permutation(300)
        nh, _, _, hn = record_stats(list(x))
        counts.append(nh)
    # E[records] = H_300 ~ 6.28; average over 200 trials close
    assert abs(np.mean(counts)
               - sum(1 / k for k in range(1, 301))) < 0.5
