"""Independent brute checks for wave-229 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave229 import (
    poisson_cusum,
    signed_rank,
)


def test_poisson_cusum_detects_shift():
    rng = np.random.default_rng(471)
    x = list(rng.poisson(5, 60)) + list(rng.poisson(15, 20))
    k = sum(x) // len(x) + 1
    alarms, max_s, s_end = poisson_cusum(x, k, 5 * k)
    assert alarms >= 1
    # in-control stream: no alarms
    x2 = list(rng.poisson(5, 80))
    k2 = sum(x2) // len(x2) + 1
    a2, m2, _ = poisson_cusum(x2, k2, 5 * k2)
    assert a2 == 0
    # step-by-step brute replay
    s = 0
    alarms_b = 0
    mx = 0
    for v in x:
        s = max(0, s + int(v) - k)
        mx = max(mx, s)
        if s > 5 * k:
            alarms_b += 1
            s = 0
    assert (alarms, max_s) == (alarms_b, mx)


def test_signed_rank_matches_scipy_free_reference():
    rng = np.random.default_rng(472)
    for trial in range(8):
        x = rng.integers(-50, 80, 200)
        x = x[x != 0]
        n, w2, z = signed_rank(list(x))
        # reference: midranks of |x|, W+ = sum ranks of positives
        av = np.abs(x)
        order = np.argsort(av, kind="stable")
        ranks = np.empty(len(x))
        sv = av[order]
        i = 0
        while i < len(x):
            j = i
            while j < len(x) and sv[j] == sv[i]:
                j += 1
            ranks[i:j] = (i + 1 + j) / 2
            i = j
        r = np.empty(len(x))
        r[order] = ranks
        wplus = r[x > 0].sum()
        assert abs(w2 / 2 - wplus) < 1e-9, trial
        nn = len(x)
        _, t = np.unique(av, return_counts=True)
        var = nn * (nn + 1) * (2 * nn + 1) / 24 \
            - (t**3 - t).sum() / 48
        zref = (wplus - nn * (nn + 1) / 4) / np.sqrt(var)
        assert abs(z - zref) < 1e-9, trial
