"""Wave-11 registry + model-level sanity for the golden-checked
MFLES/TBATS/MSTL driver queries."""

import numpy as np
import pytest


def test_wave11_registry_complete():
    from anofox_forecast_ray.pipelines.queries_wave11 import (
        build_wave11_queries,
    )

    q, o = build_wave11_queries()
    assert set(q) == {"forecast_mfles_w8", "forecast_tbats_w8",
                      "forecast_mstl_w8", "doc_dist_features",
                      "doc_period_acf", "doc_ewm_var_w8",
                      "doc_autocorr_features", "retention_expire_w8",
                      "doc_welch_power", "doc_sample_entropy_w32",
                      "doc_approx_entropy_w32", "doc_perm_entropy",
                      "orders_segment_revenue",
                      "streaming_event_windows",
                      "streaming_hopping_windows",
                      "doc_repetition_stats_v1"}
    assert set(o) == {"doc_dist_features", "doc_period_acf",
                      "doc_ewm_var_w8", "doc_autocorr_features",
                      "retention_expire_w8", "doc_welch_power",
                      "doc_sample_entropy_w32", "doc_approx_entropy_w32",
                      "doc_perm_entropy", "orders_segment_revenue",
                      "streaming_event_windows",
                      "streaming_hopping_windows",
                      "doc_repetition_stats_v1"}

    from tools.golden_oracles import GOLDEN_CHECKS

    assert set(q) - set(o) <= set(GOLDEN_CHECKS)


def test_wave11_models_fit_query_configs():
    """Each wave-11 model fits a real series under the exact query
    config and the golden oracle's independent recomputation holds."""
    import math

    from anofox_forecast_ray.kernels.mfles import mfles_fit, mfles_predict
    from anofox_forecast_ray.kernels.tbats import tbats_fit, tbats_predict
    from anofox_forecast_ray.models import make_model

    rng = np.random.default_rng(11)
    t = np.arange(48, dtype=float)
    y = 50 + 0.3 * t + 5 * np.sin(2 * np.pi * t / 4) + rng.normal(0, 0.5, 48)

    st = mfles_fit(y, 4)
    p = float(mfles_predict(st, 1)[0])
    assert math.isfinite(p) and abs(p - y[-4:].mean()) < 25

    ts = tbats_fit(y, periods=(4,), use_box_cox=False, fourier_k=(1,))
    tp = float(tbats_predict(ts, 1)[0])
    assert math.isfinite(tp)
    # measurement equation: h=1 forecast is w·x
    assert tp == pytest.approx(
        math.fsum(float(wi) * float(xi) for wi, xi in zip(ts.w, ts.x)),
        rel=1e-9,
    )

    m = make_model("mstl", periods=(4,))
    m.fit(y)
    f = m.predict(4)
    inner, seasonals, n = m.state
    last = seasonals[4][n - 4:]
    bases = f - last[np.arange(4) % 4]
    assert np.ptp(bases) < 1e-9 * max(1.0, abs(bases[0]))

    # short series refuse / NaN surface
    with pytest.raises(ValueError):
        tbats_fit(y[:6], periods=(4,), use_box_cox=False, fourier_k=(1,))
    with pytest.raises(ValueError):
        make_model("mstl", periods=(4,)).fit(y[:6])


def test_welch_seq_anchors_fft_path():
    """The sequential-scalar Welch path (the SQL-oracle-exact one) must
    agree with the FFT welch_periodogram per bin at ~1e-8 relative —
    same anchoring contract as dft_power_seq for the periodogram."""
    from anofox_forecast_ray.kernels.detection import (
        welch_periodogram,
        welch_power_seq,
    )

    rng = np.random.default_rng(23)
    t = np.arange(80, dtype=float)
    y = 30 + 4 * np.sin(2 * np.pi * t / 8) + rng.normal(0, 1, 80)
    M = 16
    seq = dict(welch_power_seq(y, M, 0.5, range(1, 5)))
    periods, power = welch_periodogram(y, M, 0.5)
    # FFT bin k has period M/k
    for k in range(1, 5):
        fft_p = power[np.argmin(np.abs(periods - M / k))]
        assert seq[k] == pytest.approx(fft_p, rel=1e-8), k
    # the injected period-8 signal dominates at k = M/8 = 2
    assert max(seq, key=seq.get) == 2
    # short series refuse
    assert welch_power_seq(y[:10], M, 0.5, [1]) is None
