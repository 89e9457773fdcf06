"""Independent brute checks for wave-186 causal estimators."""

import numpy as np

from anofox_forecast_ray.pipelines.queries_wave186 import rdd_side


def test_rdd_side_matches_polyfit():
    rng = np.random.default_rng(51)
    for trial in range(10):
        x = np.arange(-6, 0, dtype=np.int64)
        y = rng.random(6)
        a, b = rdd_side(x, y)
        coef = np.polyfit(x.astype(float), y, 1)
        assert abs(b - coef[0]) < 1e-10, trial
        assert abs(a - coef[1]) < 1e-10, trial


def test_wald_identity_on_synthetic():
    """Wald = ITT / first-stage must equal the true effect when the
    instrument is perfect (X = Z) and noise is Z-balanced."""
    rng = np.random.default_rng(52)
    z = rng.integers(0, 2, 4000)
    x = z.copy()
    beta = 250.0
    y = 1000 + beta * x + 0.0 * rng.random(4000)
    itt = y[z == 1].mean() - y[z == 0].mean()
    fs = x[z == 1].mean() - x[z == 0].mean()
    assert abs(itt / fs - beta) < 1e-9
