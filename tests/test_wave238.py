"""Independent brute check for the wave-238 expectile."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave238 import (
    expectile_replay,
)


def _hist(x):
    uk, c = np.unique(x, return_counts=True)
    return uk.astype(np.int64), c.astype(np.int64)


def test_expectile_satisfies_first_order_condition():
    """At the true expectile, tau*sum(x-e)+ = (1-tau)*sum(e-x)+."""
    rng = np.random.default_rng(561)
    x = rng.integers(0, 10000, 20000).astype(np.int64)
    v, c = _hist(x)
    e, na = expectile_replay(v, c)
    tau = 0.9
    above = (x[x > e] - e).sum()
    below = (e - x[x <= e]).sum()
    # fixed point: relative imbalance should be tiny after 6 iters
    assert abs(tau * above - (1 - tau) * below) \
        / (tau * above) < 1e-3
    assert e > np.mean(x)  # tau > 0.5 pulls above the mean
    assert e < np.quantile(x, 0.99)
    assert na == int((x > e).sum())


def test_expectile_tau_half_is_mean():
    rng = np.random.default_rng(562)
    x = rng.integers(0, 500, 5000).astype(np.int64)
    v, c = _hist(x)
    e, _ = expectile_replay(v, c, tau=0.5)
    assert abs(e - x.mean()) < 1e-9
