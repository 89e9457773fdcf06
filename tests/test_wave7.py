"""Wave-7 kernel tests: closed-form ADF, fixed-parameter GARCH, interval
calibration wiring, and the damped-ETS fixed-param fold."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.features import (
    adf_stat_lag0,
    augmented_dickey_fuller,
)
from anofox_forecast_ray.kernels.garch import (
    garch_fit_fixed,
    garch_forecast_variance,
)
from anofox_forecast_ray.kernels.metrics import (
    coverage_rate,
    rolling_interval_evaluation,
    winkler_score,
)
from anofox_forecast_ray.kernels.smoothing import ets_fit, ets_predict


def test_adf_lag0_matches_lstsq_path():
    rng = np.random.default_rng(7)
    for _ in range(5):
        y = np.cumsum(rng.normal(size=80)) + 5.0
        t_closed = adf_stat_lag0(y)
        t_lstsq = augmented_dickey_fuller(y, max_lag=0)
        assert abs(t_closed - t_lstsq) < 1e-8


def test_adf_lag0_detects_stationarity():
    rng = np.random.default_rng(3)
    stationary = rng.normal(size=200)
    walk = np.cumsum(rng.normal(size=200))
    assert adf_stat_lag0(stationary) < -3.43  # strongly rejects unit root
    assert adf_stat_lag0(walk) > -3.43
    assert np.isnan(adf_stat_lag0(np.arange(5.0)))  # too short


def test_garch_fixed_recursion_and_forecast():
    rng = np.random.default_rng(11)
    y = rng.normal(size=64)
    st = garch_fit_fixed(y, alpha=0.1, beta=0.8)
    # recursion replay
    e = y - st.mean
    var = float(np.cumsum(e * e)[-1]) / y.size
    assert st.sigma2[0] == var
    s2 = var
    for t in range(1, y.size):
        s2 = st.omega + 0.1 * e[t - 1] ** 2 + 0.8 * s2
        assert st.sigma2[t] == s2
    # long-horizon variance converges to omega / (1 - alpha - beta)
    f = garch_forecast_variance(st, 200)
    uncond = st.omega / (1.0 - 0.9)
    assert abs(f[-1] - uncond) < 1e-6 * max(uncond, 1.0)


def test_garch_fixed_rejects_short_series():
    with pytest.raises(ValueError):
        garch_fit_fixed(np.ones(5))


def test_rolling_interval_evaluation_naive_perfect_series():
    # constant series: zero residual variance, intervals collapse to the
    # point, which is always correct -> coverage 1, winkler 0
    from anofox_forecast_ray.models import make_model

    y = np.full(20, 3.0)
    cov, wink = rolling_interval_evaluation(
        lambda: make_model("naive"), y, 2, 0.95, 3
    )
    assert cov == 1.0
    assert wink == 0.0


def test_rolling_interval_evaluation_short_series_gate():
    from anofox_forecast_ray.models import make_model

    cov, wink = rolling_interval_evaluation(
        lambda: make_model("naive"), np.arange(6.0), 2, 0.95, 3
    )
    assert cov == 0.0 and np.isinf(wink)


def test_winkler_penalty_directions():
    # inside: score == width; outside: width + (2/alpha) * miss
    assert winkler_score([5.0], [4.0], [6.0], 0.05) == 2.0
    assert winkler_score([7.0], [4.0], [6.0], 0.05) == pytest.approx(
        2.0 + (2.0 / 0.05) * 1.0
    )
    assert coverage_rate([5.0, 7.0], [4.0, 4.0], [6.0, 6.0]) == 0.5


def test_ets_damped_fixed_fold_matches_manual():
    rng = np.random.default_rng(5)
    y = np.cumsum(rng.normal(size=40)) + 50.0
    a, b, phi = 0.3, 0.1, 0.9
    st = ets_fit(y, "AAdN", period=12, optimize=False,
                 alpha=a, beta=b, phi=phi)
    # manual damped Holt replay from the same heuristic init
    from anofox_forecast_ray.kernels.smoothing import (
        ETSSpec,
        _ets_initial_state,
    )

    level, trend, _ = _ets_initial_state(y, ETSSpec("A", "Ad", "N"), 12)
    for x in y:
        f = level + phi * trend
        lp = level
        level = a * x + (1.0 - a) * f
        trend = b * (level - lp) + (1.0 - b) * phi * trend
    assert st.level == pytest.approx(level, abs=1e-12)
    assert st.trend == pytest.approx(trend, abs=1e-12)
    p = ets_predict(st, 3)
    dsum = 0.0
    for h in range(1, 4):
        dsum = phi * (1.0 - phi**h) / (1.0 - phi)
        assert p[h - 1] == pytest.approx(level + dsum * trend, abs=1e-12)


def test_wave7_registry_complete():
    from anofox_forecast_ray.pipelines.queries_wave7 import (
        build_wave7_queries,
    )

    q, o = build_wave7_queries()
    assert set(q) == {
        "forecast_metrics_w8", "doc_acf_w8", "doc_adf_lag0",
        "forecast_garch_w8", "doc_rolling_median_w8",
        "doc_token_quantiles", "interval_naive_cov_w8",
        "forecast_ets_damped_w8",
    }
    assert set(o) == set(q)  # every wave-7 query carries a hard oracle
