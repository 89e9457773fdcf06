"""Feature / detection / changepoint / validation kernel tests.

Pinned to hand-computed values and cross-checked against simple sequential
implementations (the reference's tsfresh-style semantics, citations in the
kernel docstrings)."""

import math

import numpy as np
import pytest

from anofox_forecast_ray.kernels import features as F
from anofox_forecast_ray.kernels import detection as D
from anofox_forecast_ray.kernels import validation as V
from anofox_forecast_ray.kernels.changepoint import pelt_detect
from anofox_forecast_ray.kernels.bootstrap import BootstrapConfig, bootstrap_forecast
from anofox_forecast_ray.kernels.cross_validation import CVConfig, cross_validate


Y = np.array([1.0, 2.0, 4.0, 3.0, 5.0])


def test_basic_features():
    assert F.abs_energy(Y) == 1 + 4 + 16 + 9 + 25
    assert F.absolute_sum_of_changes(Y) == 1 + 2 + 1 + 2
    assert F.mean_abs_change(Y) == 1.5
    assert F.mean_change(Y) == 1.0
    assert F.maximum(Y) == 5 and F.minimum(Y) == 1
    assert F.median(Y) == 3
    assert F.root_mean_square(Y) == pytest.approx(math.sqrt(55 / 5))
    assert F.mean_second_derivative_central(Y) == pytest.approx(
        np.mean([4 - 2 * 2 + 1, 3 - 2 * 4 + 2, 5 - 2 * 3 + 4]) / 2
    )
    assert F.mean_n_absolute_max(Y, 2) == 4.5


def test_counting_features():
    y = np.array([1.0, 3.0, 1.0, 3.0, 1.0, 5.0])
    assert F.count_above_mean(y) == 3
    assert F.count_below_mean(y) == 3
    assert F.number_crossing_m(y, 2.0) == 5
    assert F.number_peaks(np.array([0, 1, 0, 2, 0, 3, 0.0]), 1) == 3
    assert F.longest_strike_above_mean(np.array([0, 5, 5, 5, 0, 5.0])) == 3
    assert F.has_duplicate(y) and F.has_duplicate_min(y)
    assert not F.has_duplicate_max(y)
    assert F.value_count(y, 1.0) == 3
    assert F.range_count(y, 1.0, 3.0) == 5
    assert F.first_location_of_maximum(y) == 5 / 6
    assert F.last_location_of_minimum(y) == 5 / 6


def test_distribution_features():
    rng = np.random.default_rng(0)
    y = rng.normal(0, 1, 5000)
    assert F.skewness(y) == pytest.approx(0.0, abs=0.1)
    assert F.kurtosis(y) == pytest.approx(0.0, abs=0.2)
    assert F.quantile(np.array([1.0, 2, 3, 4]), 0.5) == 2.5
    assert F.ratio_beyond_r_sigma(y, 2.0) == pytest.approx(0.046, abs=0.01)
    assert F.variance_larger_than_standard_deviation(np.array([0.0, 10, 20]))


def test_autocorrelation():
    y = np.sin(np.arange(100) * 2 * np.pi / 10)
    assert F.autocorrelation(y, 10) == pytest.approx(0.9, abs=0.1)
    assert F.autocorrelation(y, 5) < -0.8
    # PACF lag1 == ACF lag1
    assert F.partial_autocorrelation(y, 1) == pytest.approx(
        F.autocorrelation(y, 1)
    )


def test_entropy_monotonicity():
    rng = np.random.default_rng(1)
    noise = rng.normal(0, 1, 300)
    regular = np.sin(np.arange(300) / 5)
    assert F.sample_entropy(noise) > F.sample_entropy(regular)
    assert F.permutation_entropy(noise) > F.permutation_entropy(regular)
    assert F.binned_entropy(noise) > 0
    assert F.lempel_ziv_complexity(noise) > F.lempel_ziv_complexity(regular)


def test_change_features():
    y = np.array([1.0, 1.0, 2.0, 3.0, 3.0, 3.0])
    assert F.percentage_of_reoccurring_datapoints_to_all_datapoints(y) == 5 / 6
    assert F.percentage_of_reoccurring_values_to_all_values(y) == 2 / 3
    assert F.ratio_value_number_to_time_series_length(y) == 3 / 6
    assert F.sum_of_reoccurring_values(y) == 4.0
    assert F.sum_of_reoccurring_data_points(y) == 2 + 9


def test_linear_trend():
    y = 3.0 + 2.0 * np.arange(50)
    lt = F.linear_trend(y)
    assert lt["slope"] == pytest.approx(2.0)
    assert lt["intercept"] == pytest.approx(3.0)
    assert lt["rvalue"] == pytest.approx(1.0)


def test_adf_distinguishes():
    rng = np.random.default_rng(2)
    stationary = rng.normal(0, 1, 300)
    walk = np.cumsum(rng.normal(0, 1, 300))
    assert F.augmented_dickey_fuller(stationary) < -4
    assert F.augmented_dickey_fuller(walk) > -2.5


def test_outlier_detection():
    y = np.concatenate([np.random.default_rng(3).normal(0, 1, 100), [30.0]])
    for method in ("iqr", "zscore", "modified_zscore"):
        idx, scores, thr = D.detect_outliers(y, method)
        assert 100 in idx.tolist(), method


def test_periodicity_detectors():
    t = np.arange(240)
    y = 10 * np.sin(2 * np.pi * t / 12) + np.random.default_rng(4).normal(0, 0.5, 240)
    p_acf, conf_acf = D.detect_period_acf(y, 2, 60)
    assert p_acf == 12 and conf_acf > 0.5
    p_fft, conf_fft = D.detect_period_fft(y, 2, 60)
    assert p_fft == 12
    noise = np.random.default_rng(5).normal(0, 1, 240)
    p_n, _ = D.detect_period_acf(noise, 2, 60)
    assert p_n == 0 or p_n > 0  # no crash; usually 0


def test_seasonal_strength():
    t = np.arange(120)
    seasonal = 10 * np.sin(2 * np.pi * t / 12)
    assert D.seasonal_strength(seasonal, 12) > 0.95
    noise = np.random.default_rng(6).normal(0, 1, 120)
    assert D.seasonal_strength(noise, 12) < 0.5


def test_pelt_finds_mean_shift():
    rng = np.random.default_rng(7)
    y = np.concatenate([rng.normal(0, 1, 100), rng.normal(8, 1, 100)])
    cps = pelt_detect(y, cost="l2")
    assert any(abs(c - 100) <= 3 for c in cps), cps
    flat = rng.normal(0, 1, 200)
    assert len(pelt_detect(flat, cost="l2")) <= 2


def test_ljung_box_chi2():
    # chi2_sf sanity: P(X > df) ~ known values
    assert V.chi2_sf(3.84, 1) == pytest.approx(0.05, abs=0.003)
    assert V.chi2_sf(18.31, 10) == pytest.approx(0.05, abs=0.003)
    rng = np.random.default_rng(8)
    white = rng.normal(0, 1, 500)
    lb = V.ljung_box(white)
    assert lb["p_value"] > 0.01
    ar = np.zeros(500)
    for i in range(1, 500):
        ar[i] = 0.8 * ar[i - 1] + rng.normal()
    lb2 = V.ljung_box(ar)
    assert lb2["p_value"] < 1e-6
    assert V.durbin_watson(white) == pytest.approx(2.0, abs=0.3)


def test_kpss_and_stationarity():
    rng = np.random.default_rng(9)
    stationary = rng.normal(0, 1, 400)
    walk = np.cumsum(rng.normal(0, 1, 400))
    assert V.kpss_test(stationary)["statistic"] < 0.463
    assert V.kpss_test(walk)["statistic"] > 0.463
    verdict = V.test_stationarity(stationary)
    assert verdict["stationary"]
    assert not V.test_stationarity(walk)["stationary"]


def test_cross_validate():
    from anofox_forecast_ray.models import SES

    y = 50 + np.sin(np.arange(60) / 3)
    res = cross_validate(
        y, lambda: SES(alpha=0.5),
        CVConfig(horizon=2, initial_train_size=20, step=5),
    )
    assert res["n_folds"] == 8
    assert res["aggregate"]["mean_rmse"] < 2.0


def test_bootstrap_intervals():
    from anofox_forecast_ray.models import Naive

    rng = np.random.default_rng(10)
    y = 100 + rng.normal(0, 2, 80)
    point, lo, hi = bootstrap_forecast(
        Naive(), y, 3, BootstrapConfig(n_iterations=500, seed=1)
    )
    assert (lo <= point).all() and (point <= hi).all()
    # determinism
    p2, lo2, hi2 = bootstrap_forecast(
        Naive(), y, 3, BootstrapConfig(n_iterations=500, seed=1)
    )
    assert lo.tolist() == lo2.tolist() and hi.tolist() == hi2.tolist()


def test_feature_extractor_stage():
    from anofox_forecast_ray.config import SMALL_TIERS
    from anofox_forecast_ray.corpus import generate_corpus
    from anofox_forecast_ray.stages.features_stage import FeatureExtractor

    corpus = generate_corpus(20, seed=5, mean_len=200, sigma=0.8)
    fx = FeatureExtractor(SMALL_TIERS[:2])
    out = fx(corpus).to_pandas()
    assert set(out["tier"]) == {"w8", "w32"}
    assert out["mean"].notna().all()
    # spot-check one doc/tier against direct kernel call
    toks = np.asarray(corpus.column("tokens")[0].as_py(), dtype=np.int64)
    w = 8
    means = np.array([
        toks[k * w : (k + 1) * w].mean()
        for k in range((len(toks) + w - 1) // w)
    ])
    row = out[(out.doc_id == corpus.column("doc_id")[0].as_py())
              & (out.tier == "w8")].iloc[0]
    assert row["abs_energy"] == pytest.approx(float(np.dot(means, means)))
    assert row["linear_trend_slope"] == pytest.approx(
        F.linear_trend(means)["slope"]
    )


def test_research_period_detectors():
    rng = np.random.default_rng(11)
    t = np.arange(240)
    y = 10 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 0.5, 240)
    p1, c1 = D.detect_period_autoperiod(y)
    assert abs(p1 - 12) <= 1 and c1 > 0.3
    p2, c2 = D.detect_period_cfd_autoperiod(y)
    assert abs(p2 - 12) <= 1
    p3, agree = D.detect_period_sazed(y)
    # vote confidence = winning bucket / all candidates (5 components +
    # their divisor refinements); majority = clear agreement
    assert abs(p3 - 12) <= 1 and agree > 0.5
    p4, _ = D.detect_period(y)
    assert abs(p4 - 12) <= 1


def test_period_detectors_on_noise():
    noise = np.random.default_rng(12).normal(0, 1, 240)
    p, c = D.detect_period_autoperiod(noise)
    # noise: either no period or weak confidence
    assert p == 0 or c < 0.5


def test_winkler_interval_calibration():
    """Interval-calibration check via rolling-origin CV and the Winkler
    score (reference tests/interval_calibration.rs category)."""
    from anofox_forecast_ray.models import SES

    rng = np.random.default_rng(13)
    y = 100 + rng.normal(0, 5, 200)
    level = 0.9
    hits, scores = [], []
    for start in range(50, 190, 5):
        m = SES(alpha=0.3).fit(y[:start])
        point, lo, hi = m.predict_with_intervals(1, level)
        actual = y[start]
        hits.append(lo[0] <= actual <= hi[0])
        w = hi[0] - lo[0]
        if actual < lo[0]:
            w += 2 / (1 - level) * (lo[0] - actual)
        elif actual > hi[0]:
            w += 2 / (1 - level) * (actual - hi[0])
        scores.append(w)
    coverage = np.mean(hits)
    assert coverage >= 0.75  # nominal 0.9; allow sampling slack
    assert np.mean(scores) < 40  # winkler sanity for sigma=5


def test_full_feature_registry_runs():
    rng = np.random.default_rng(50)
    y = 50 + 5 * np.sin(np.arange(200) / 6) + rng.normal(0, 1, 200)
    for name, fn in F.FEATURES.items():
        v = fn(y)
        assert isinstance(v, (int, float, bool, np.floating, np.integer)), name
        assert np.isfinite(float(v)) or name in (), name


def test_rolling_var_std():
    y = np.array([1.0, 2, 3, 4, 5])
    rv = F and None  # placeholder keep flake quiet
    from anofox_forecast_ray.kernels.windows import rolling_std, rolling_var

    v = rolling_var(y, 3)
    assert np.isnan(v[:2]).all()
    assert v[2] == pytest.approx(1.0)  # var([1,2,3], ddof=1) = 1
    s = rolling_std(y, 3)
    assert s[4] == pytest.approx(1.0)


def test_theta_interval_factor_matches_reference():
    from anofox_forecast_ray.kernels.theta import theta_fit, theta_intervals
    from anofox_forecast_ray.kernels.stats import quantile_normal

    y = 10 + 2 * np.arange(40) + np.random.default_rng(51).normal(0, 1, 40)
    st = theta_fit(y)
    point, lo, hi = theta_intervals(st, 3, 0.95)
    z = quantile_normal(0.975)
    beta2 = (1 - st.alpha) ** 2
    f2 = 1 + beta2 * (1 - beta2) / (1 - beta2)
    assert hi[1] - point[1] == pytest.approx(z * np.sqrt(st.variance * f2), rel=1e-12)


def test_welch_periodogram():
    t = np.arange(1024)
    y = np.sin(2 * np.pi * t / 16) + np.random.default_rng(60).normal(0, 0.2, 1024)
    periods, power = D.welch_periodogram(y, window_size=256)
    assert periods.size == power.size > 0
    best = periods[np.argmax(power)]
    assert abs(best - 16) <= 1


def test_cross_validate_rolling_strategy():
    from anofox_forecast_ray.models import Naive

    y = np.arange(100, dtype=np.float64)
    res = cross_validate(
        y, Naive,
        CVConfig(horizon=1, initial_train_size=30, step=10,
                 strategy="rolling", window_size=20, max_folds=3),
    )
    assert res["n_folds"] == 3
    # naive on a ramp: one-step error is exactly 1
    assert res["aggregate"]["mean_mae"] == pytest.approx(1.0)


def test_adf_test_buckets():
    rng = np.random.default_rng(70)
    stationary = rng.normal(0, 1, 300)
    walk = np.cumsum(rng.normal(0, 1, 300))
    r1 = V.adf_test(stationary)
    assert r1["stationary"] and r1["p_value"] <= 0.05
    r2 = V.adf_test(walk)
    assert not r2["stationary"] and r2["p_value"] >= 0.10
    assert r1["critical_values"]["5%"] == -2.86


def test_pvalue_maps_match_reference():
    """Pin the exact reference mappings (stationarity.rs:240-272 ADF
    buckets + tail formula; :366-381 KPSS piecewise-linear)."""
    import math

    # ADF buckets, one probe per branch
    for t, p in [(-5.0, 0.001), (-3.7, 0.01), (-3.0, 0.05), (-2.7, 0.10),
                 (-2.0, 0.20), (-1.8, 0.30), (-1.5, 0.40), (-1.0, 0.50),
                 (-0.5, 0.70)]:
        assert V.adf_p_value(t) == p, t
    # tail: 0.90 + 0.05 * (1 - exp(-t))
    assert V.adf_p_value(1.0) == 0.90 + 0.05 * (1.0 - math.exp(-1.0))
    assert math.isnan(V.adf_p_value(float("nan")))

    # KPSS piecewise-linear, one probe per branch + boundaries
    assert V.kpss_p_value(0.0) == 1.0
    assert V.kpss_p_value(0.2) == 0.10 + 0.90 * (1.0 - 0.2 / 0.347)
    assert V.kpss_p_value(0.4) == 0.05 + 0.05 * (0.463 - 0.4) / (0.463 - 0.347)
    assert V.kpss_p_value(0.6) == 0.01 + 0.04 * (0.739 - 0.6) / (0.739 - 0.463)
    assert V.kpss_p_value(0.9) == 0.01 * (1.0 - (0.9 - 0.739))
    assert V.kpss_p_value(2.0) == 0.0
    # monotone non-increasing across branch boundaries
    probes = [0.0, 0.1, 0.346, 0.347, 0.46, 0.463, 0.7, 0.739, 1.0, 1.8]
    vals = [V.kpss_p_value(x) for x in probes]
    assert all(a >= b for a, b in zip(vals, vals[1:]))

    # conclusion field matches the reference's 3-way verdict
    rng = np.random.default_rng(71)
    assert V.test_stationarity(rng.normal(0, 1, 300))["conclusion"] == "stationary"
    assert V.test_stationarity(np.cumsum(rng.normal(0, 1, 300)))["conclusion"] == "non_stationary"


def test_sazed_reference_cases():
    """Ports of the reference's own SAZED cases (sazed.rs:416-556)."""
    t = np.arange(200, dtype=float)
    # pure sine, period 20
    p, _ = D.detect_period_sazed(10.0 * np.sin(2 * np.pi * t / 20.0))
    assert abs(p - 20) <= 1
    # weekly pattern
    t2 = np.arange(140, dtype=float)
    p, _ = D.detect_period_sazed(5.0 * np.sin(2 * np.pi * t2 / 7.0) + 50.0)
    assert abs(p - 7) <= 1
    # with linear trend: CFD's detrended hints find the period family but
    # validation on the (trended) original ACF may lock onto a harmonic —
    # same behavior as the reference's validate_with_acf on the original
    y = 10.0 * np.sin(2 * np.pi * t / 20.0) + 0.05 * t
    p_cfd, _ = D.detect_period_cfd_autoperiod(y)
    assert min(p_cfd % 20, 20 - p_cfd % 20) <= 2, p_cfd
    # constant series: nothing to detect
    p, c = D.detect_period_sazed(np.full(100, 3.0))
    assert p == 0 or c == 0.0 or p < 2


def test_autoperiod_gradient_ascent_refines_hint():
    """A periodogram hint one off the ACF hill must walk to the true
    period (periodicity.rs:476-515)."""
    rng = np.random.default_rng(21)
    t = np.arange(300, dtype=float)
    y = 8.0 * np.sin(2 * np.pi * t / 25.0) + rng.normal(0, 0.4, 300)
    p, s = D.detect_period_autoperiod(y)
    assert abs(p - 25) <= 1 and s > 0.5


def test_periodogram_peaks_noise_floor():
    rng = np.random.default_rng(22)
    t = np.arange(256, dtype=float)
    y = 5.0 * np.sin(2 * np.pi * t / 16.0) + rng.normal(0, 1.0, 256)
    peaks = D.periodogram_peaks(y, threshold=3.0, min_period=2,
                                max_period=128)
    assert peaks and peaks[0][0] == 16
    # white noise: few or no peaks at 3x the median floor
    assert len(D.periodogram_peaks(rng.normal(0, 1, 256), 6.0, 2, 128)) <= 2


def test_pyriodicity_validation_matrix():
    """Port of the reference's pyriodicity standalone validation
    (tests/validate_against_pyriodicity.py:77-290): every detector must
    recover the known period within +-2 on the script's dataset suite."""
    rng = np.random.default_rng(42)
    datasets = {}
    for period in (7, 12, 30):
        t = np.arange(period * 20, dtype=float)
        datasets[f"sine_{period}"] = (np.sin(2 * np.pi * t / period), period)
    t = np.arange(240, dtype=float)
    datasets["noisy_12"] = (
        np.sin(2 * np.pi * t / 12) + 0.3 * rng.standard_normal(240), 12
    )
    detectors = {
        "acf": lambda y: D.detect_period_acf(y, 2, 120)[0],
        "fft": lambda y: D.detect_period_fft(y, 2, 120)[0],
        "autoperiod": lambda y: D.detect_period_autoperiod(y)[0],
        "sazed": lambda y: D.detect_period_sazed(y)[0],
    }
    failures = []
    for dname, (y, true_p) in datasets.items():
        for mname, det in detectors.items():
            p = det(y)
            if not (p and abs(p - true_p) <= 2):
                failures.append((dname, mname, p, true_p))
    assert not failures, failures
    # trended signal: the detrending detector must still recover it
    yt = 0.1 * t + 10 * np.sin(2 * np.pi * t / 12)
    p, _ = D.detect_period_cfd_autoperiod(yt)
    assert p and min(p % 12, 12 - p % 12) <= 2, p
    # multi-frequency: autoperiod's primary must be one of the truths
    t2 = np.arange(365, dtype=float)
    ym = np.sin(2 * np.pi * t2 / 7) + 0.5 * np.sin(2 * np.pi * t2 / 30)
    p, _ = D.detect_period_autoperiod(ym)
    assert any(abs(p - q) <= 2 for q in (7, 30)), p
