"""Independent brute checks for wave-198 operators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave198 import (
    _brute_bandit,
    bandit_replay,
)


def test_bandit_replay_matches_fraction_brute():
    rng = np.random.default_rng(171)
    for trial in range(10):
        daily = rng.integers(0, 50, (int(rng.integers(5, 80)), 5))
        got = bandit_replay(daily.astype(np.int64))
        want = _brute_bandit(daily.astype(np.int64))
        assert got == want, trial


def test_bandit_conservation():
    rng = np.random.default_rng(172)
    daily = rng.integers(0, 50, (60, 5)).astype(np.int64)
    pulls, s = bandit_replay(daily)
    assert sum(pulls) == 60
    # collected reward equals sum over days of chosen-arm reward
    assert sum(s) <= int(daily.max(axis=1).sum())


def test_geweke_and_ess_formulas():
    rng = np.random.default_rng(173)
    x = rng.poisson(40, 700).astype(np.int64)
    n = len(x)
    na, nb = n // 10, n // 2
    xa, xb = x[:na], x[n - nb:]
    z = (xa.mean() - xb.mean()) / np.sqrt(
        xa.var(ddof=1) / na + xb.var(ddof=1) / nb)
    # same via explicit moments
    ma = xa.sum() / na
    va = ((xa - ma) ** 2).sum() / (na - 1)
    mb = xb.sum() / nb
    vb = ((xb - mb) ** 2).sum() / (nb - 1)
    z2 = (ma - mb) / np.sqrt(va / na + vb / nb)
    assert abs(z - z2) < 1e-10
    m = x.mean()
    den = ((x - m) ** 2).sum()
    ac = sum(((x[:-k] - m) * (x[k:] - m)).sum() / den
             for k in range(1, 9))
    ess = n / (1 + 2 * ac)
    # white noise: ESS should be within 40% of n
    assert 0.6 * n < ess < 1.6 * n
