"""Interval calibration layer: prediction intervals must achieve their
stated coverage under rolling-origin cross-validation, and the Winkler
score must order interval quality correctly.

Port of the reference's calibration test suite
(tests/interval_calibration.rs:186-466) — same synthetic generators,
horizons, origin counts and tolerance floors.
"""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_ray.kernels.bootstrap import (
    BootstrapConfig,
    bootstrap_forecast,
)
from anofox_forecast_ray.kernels.metrics import (
    coverage_rate,
    rolling_interval_evaluation,
    winkler_score,
)
from anofox_forecast_ray.models import make_model


def test_coverage_naive_95():
    # random walk (seeded; the reference uses thread_rng with the same
    # 0.70 floor)
    rng = np.random.default_rng(7)
    values = [100.0]
    for _ in range(1, 200):
        values.append(values[-1] + rng.uniform(-5.0, 5.0))
    cov, _ = rolling_interval_evaluation(
        lambda: make_model("naive"), np.array(values), 5, 0.95, 20
    )
    assert cov >= 0.70, f"Naive 95% coverage too low: {cov:.2%}"


def test_coverage_mean_95():
    values = 50.0 + np.sin(np.arange(200) * 0.3) * 5.0
    cov, _ = rolling_interval_evaluation(
        lambda: make_model("historic_average"), values, 5, 0.95, 20
    )
    assert cov >= 0.70, f"HistoricAverage 95% coverage too low: {cov:.2%}"


def test_coverage_ses_95():
    values = [100.0]
    for i in range(1, 200):
        values.append(values[-1] * 0.9 + 10.0 + np.sin(i * 0.2) * 3.0)
    cov, _ = rolling_interval_evaluation(
        lambda: make_model("ses"), np.array(values), 5, 0.95, 20
    )
    assert cov >= 0.30, f"SES 95% coverage too low: {cov:.2%}"


def test_coverage_holt_95():
    i = np.arange(200, dtype=float)
    values = 100.0 + i * 0.5 + np.sin(i * 0.1) * 5.0
    cov, _ = rolling_interval_evaluation(
        lambda: make_model("holt"), values, 5, 0.95, 20
    )
    assert cov >= 0.50, f"Holt 95% coverage too low: {cov:.2%}"


def test_coverage_theta_95():
    i = np.arange(200, dtype=float)
    values = 50.0 + i * 0.3 + np.sin(i * 0.2) * 8.0
    cov, _ = rolling_interval_evaluation(
        lambda: make_model("theta"), values, 5, 0.95, 20
    )
    assert cov >= 0.50, f"Theta 95% coverage too low: {cov:.2%}"


def test_coverage_seasonal_naive():
    period = 12
    i = np.arange(200, dtype=float)
    values = 50.0 + 20.0 * np.sin(i * 2.0 * np.pi / period) + i * 0.1
    cov, _ = rolling_interval_evaluation(
        lambda: make_model("seasonal_naive", period=period),
        values, period, 0.95, 15,
    )
    assert cov >= 0.50, f"SeasonalNaive 95% coverage too low: {cov:.2%}"


def test_coverage_levels_ordering():
    values = 100.0 + np.sin(np.arange(200) * 0.3) * 10.0
    covs = {}
    for level in (0.80, 0.95, 0.99):
        covs[level], _ = rolling_interval_evaluation(
            lambda: make_model("naive"), values, 3, level, 15
        )
    assert covs[0.95] >= covs[0.80] - 0.15
    assert covs[0.99] >= covs[0.95] - 0.10


def test_winkler_penalizes_miscoverage():
    actuals = [10.0, 20.0, 30.0]
    good = winkler_score(actuals, [5.0, 15.0, 25.0], [15.0, 25.0, 35.0], 0.05)
    bad = winkler_score(actuals, [0.0, 0.0, 0.0], [5.0, 10.0, 15.0], 0.05)
    assert bad > good


def test_winkler_penalizes_width():
    actuals = [10.0, 20.0, 30.0]
    narrow = winkler_score(
        actuals, [9.0, 19.0, 29.0], [11.0, 21.0, 31.0], 0.05
    )
    wide = winkler_score(actuals, [0.0, 10.0, 20.0], [20.0, 30.0, 40.0], 0.05)
    assert wide > narrow


def test_coverage_rate_basic():
    assert coverage_rate([1.0, 2.0, 3.0], [0.0, 0.0, 3.5], [2.0, 1.5, 4.0]) \
        == pytest.approx(1.0 / 3.0)
    assert coverage_rate([], [], []) == 0.0


def _rolling_bootstrap(model_name, values, horizon, level, n_origins, cfg,
                       **model_kw):
    """Bootstrap analogue of rolling_interval_evaluation
    (tests/interval_calibration.rs:124-180)."""
    y = np.asarray(values, float)
    n = y.size
    min_train = n // 2
    acts, los, ups = [], [], []
    for i in range(n_origins):
        train_end = min_train + i
        if train_end + horizon > n:
            break
        model = make_model(model_name, **model_kw)
        _, lo, up = bootstrap_forecast(model, y[:train_end], horizon, cfg)
        acts.append(y[train_end : train_end + horizon])
        los.append(lo)
        ups.append(up)
    a = np.concatenate(acts)
    return (coverage_rate(a, np.concatenate(los), np.concatenate(ups)),
            winkler_score(a, np.concatenate(los), np.concatenate(ups),
                          1.0 - level))


def test_coverage_bootstrap_naive():
    values = 50.0 + np.sin(np.arange(150) * 0.2) * 10.0
    cfg = BootstrapConfig(n_iterations=100, seed=42, level=0.95)
    cov, wink = _rolling_bootstrap("naive", values, 3, 0.95, 10, cfg)
    assert cov > 0.0 or np.isfinite(wink)


def test_coverage_bootstrap_ses():
    i = np.arange(150, dtype=float)
    values = 100.0 + i * 0.2 + np.sin(i * 0.3) * 5.0
    cfg = BootstrapConfig(n_iterations=100, seed=123, level=0.95)
    cov, _ = _rolling_bootstrap("ses", values, 3, 0.95, 10, cfg)
    assert cov >= 0.20, f"Bootstrap SES coverage too low: {cov:.2%}"


def test_bootstrap_block_preserves_autocorrelation():
    values = [50.0]
    for i in range(1, 150):
        values.append(values[-1] * 0.8 + 10.0 + np.sin(i * 0.15) * 3.0)
    res_cfg = BootstrapConfig(n_iterations=100, seed=42, level=0.95)
    blk_cfg = BootstrapConfig(n_iterations=100, seed=42, level=0.95,
                              method="block", block_size=5)
    res_cov, _ = _rolling_bootstrap("naive", values, 3, 0.95, 10, res_cfg)
    blk_cov, _ = _rolling_bootstrap("naive", values, 3, 0.95, 10, blk_cfg)
    assert res_cov > 0.0
    assert blk_cov > 0.0
