"""Wave-9 tests: the naive sequential DFT anchors the FFT periodogram,
and the complexity features fold sequentially."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.detection import dft_power_seq, periodogram
from anofox_forecast_ray.kernels.features import (
    c3,
    cid_ce,
    time_reversal_asymmetry_statistic,
)


def test_dft_matches_fft_periodogram_bins():
    rng = np.random.default_rng(13)
    for n in (32, 100, 257):
        y = (np.sin(2 * np.pi * 3 * np.arange(n) / n)
             + 0.3 * rng.normal(size=n) + 5.0)
        ks = [1, 2, 3, 4, 5]
        naive = dft_power_seq(y, ks)
        spec = np.abs(np.fft.rfft(y - y.mean())) ** 2 / n
        for k, (_, _, p) in zip(ks, naive):
            assert p == pytest.approx(spec[k], rel=1e-8, abs=1e-9)


def test_dft_detects_planted_period():
    n = 64
    y = np.sin(2 * np.pi * 4 * np.arange(n) / n)
    powers = [p for _, _, p in dft_power_seq(y, [1, 2, 3, 4, 5])]
    assert int(np.argmax(powers)) == 3  # k = 4 dominates


def test_complexity_folds_match_definitions():
    rng = np.random.default_rng(21)
    y = rng.normal(size=50)
    d = np.diff(y)
    assert cid_ce(y) == pytest.approx(float(np.sqrt((d * d).sum())),
                                      rel=1e-12)
    n = y.size
    assert c3(y, 1) == pytest.approx(
        float(np.mean(y[2:] * y[1:n - 1] * y[:n - 2])), rel=1e-10
    )
    a, b, c = y[2:], y[1:n - 1], y[:n - 2]
    assert time_reversal_asymmetry_statistic(y, 1) == pytest.approx(
        float(np.mean(a * a * b - b * c * c)), rel=1e-10
    )
    # degenerate guards
    assert c3(np.ones(2), 1) == 0.0
    assert time_reversal_asymmetry_statistic(np.ones(2), 1) == 0.0


def test_wave9_registry_complete():
    from anofox_forecast_ray.pipelines.queries_wave9 import (
        build_wave9_queries,
    )

    q, o = build_wave9_queries()
    assert set(q) == {"doc_dft_power", "doc_complexity",
                      "doc_change_features", "doc_seasonal_strength"}
    assert set(o) == set(q)


def test_ets_multiplicative_tight_loop_matches_generic():
    """MNN/MAN/MAdN tight loops equal the generic dispatch arm."""
    import math

    from anofox_forecast_ray.kernels.smoothing import (
        ETSSpec,
        _ets_initial_state,
        _ets_nll,
        _ets_one_step,
        _ets_update,
    )

    rng = np.random.default_rng(3)
    y = np.abs(np.cumsum(rng.normal(size=120)) + 60.0) + 1.0

    def generic(spec, alpha, beta, phi):
        level, trend, _ = _ets_initial_state(y, spec, 12)
        phi_ = 1.0 if phi is None else phi
        beta_ = 0.0 if beta is None else beta
        sse = 0.0
        sly = 0.0
        for yt in y:
            f = _ets_one_step(spec, level, trend, 1.0, phi_)
            err = yt - f
            if abs(f) > 1e-10:
                err = err / f
            sse += err * err
            sly += math.log(abs(yt))
            level, trend, _s = _ets_update(
                spec, level, trend, 1.0, yt, alpha, beta_, 0.0, phi_
            )
        s2 = max(sse / y.size, 1e-300)
        return (0.5 * y.size * (1.0 + math.log(s2) + math.log(2.0 * math.pi))
                + sly)

    cases = [
        (ETSSpec("M", "N", "N"), 0.3, None, None),
        (ETSSpec("M", "A", "N"), 0.3, 0.1, None),
        (ETSSpec("M", "Ad", "N"), 0.3, 0.1, 0.9),
    ]
    for spec, a, b, ph in cases:
        fast = _ets_nll(y, spec, 12, a, b, None, ph, None, None)
        assert fast == pytest.approx(generic(spec, a, b, ph), rel=1e-12)


def test_seasonal_strength_planted_signal():
    from anofox_forecast_ray.kernels.detection import (
        detect_seasonality,
        seasonal_strength,
    )

    rng = np.random.default_rng(8)
    n = 96
    seasonal = np.tile([5.0, -1.0, -3.0, -1.0], n // 4)
    noisy = seasonal + 0.1 * rng.normal(size=n) + np.linspace(0, 3, n)
    assert seasonal_strength(noisy, 4) > 0.9
    assert detect_seasonality(noisy, 4)
    flat = rng.normal(size=n)
    assert seasonal_strength(flat, 4) < 0.5
    assert seasonal_strength(flat[:6], 4) == 0.0  # < 2*period gate
