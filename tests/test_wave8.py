"""Wave-8 kernel tests: fixed-alpha ADIDA/IMAPA, sequential PACF,
fold-based binned entropy, intermittent thresholding."""

import math

import numpy as np
import pytest

from anofox_forecast_ray.kernels.features import (
    binned_entropy,
    partial_autocorrelation,
)
from anofox_forecast_ray.kernels.intermittent import adida_fit


def test_adida_fixed_alpha_replay():
    # demand every 3rd step -> mean interval 3 -> bucket 3
    y = np.zeros(12)
    y[2::3] = [6.0, 9.0, 3.0, 12.0]
    st = adida_fit(y, alpha=0.5)
    assert st.bucket == 3
    # bucket sums = [6, 9, 3, 12]; SES(0.5) left fold
    lev = 6.0
    for x in [9.0, 3.0, 12.0]:
        lev = 0.5 * x + 0.5 * lev
    assert st.level == lev
    assert st.point == lev / 3


def test_adida_optimized_default_still_works():
    rng = np.random.default_rng(2)
    y = np.where(rng.random(40) < 0.3, rng.integers(1, 9, 40), 0).astype(float)
    st = adida_fit(y)  # alpha=None -> Nelder-Mead SES
    assert st.point > 0


def test_imapa_fixed_alpha_is_mean_of_levels():
    from anofox_forecast_ray.models import IMAPA

    y = np.zeros(12)
    y[2::3] = [6.0, 9.0, 3.0, 12.0]
    m = IMAPA(max_levels=3, alpha=0.5).fit(y)
    pts = []
    for bucket in (1, 2, 3):
        nb = y.size // bucket
        sums = y[y.size - nb * bucket:].reshape(nb, bucket).sum(axis=1)
        lev = sums[0]
        for x in sums[1:]:
            lev = 0.5 * x + 0.5 * lev
        pts.append(lev / bucket)
    assert m.predict(1)[0] == pytest.approx(np.mean(pts), abs=1e-12)


def test_pacf_small_lags_closed_form():
    rng = np.random.default_rng(9)
    y = np.cumsum(rng.normal(size=60))
    from anofox_forecast_ray.kernels.features import acf

    r = acf(y, 3)
    assert partial_autocorrelation(y, 1) == pytest.approx(r[1], abs=1e-15)
    phi22 = (r[2] - r[1] * r[1]) / (1.0 - r[1] * r[1])
    assert partial_autocorrelation(y, 2) == pytest.approx(phi22, abs=1e-14)
    phi21 = r[1] - phi22 * r[1]
    phi33 = (r[3] - (phi21 * r[2] + phi22 * r[1])) / (
        1.0 - (phi21 * r[1] + phi22 * r[2])
    )
    assert partial_autocorrelation(y, 3) == pytest.approx(phi33, abs=1e-13)


def test_pacf_ar1_signature():
    # AR(1): pacf cuts off after lag 1
    rng = np.random.default_rng(4)
    y = np.zeros(2000)
    for t in range(1, y.size):
        y[t] = 0.7 * y[t - 1] + rng.normal()
    assert partial_autocorrelation(y, 1) == pytest.approx(0.7, abs=0.05)
    assert abs(partial_autocorrelation(y, 2)) < 0.08


def test_binned_entropy_uniform_and_constant():
    assert binned_entropy(np.full(50, 3.0)) == 0.0
    # 10 equal-mass bins -> entropy = ln(10)
    y = np.repeat(np.arange(10, dtype=float), 5) + 0.001
    assert binned_entropy(y, 10) == pytest.approx(math.log(10), abs=1e-9)


def test_binned_entropy_sequential_fold_replay():
    rng = np.random.default_rng(6)
    y = rng.normal(size=100)
    lo, hi = float(y.min()), float(y.max())
    width = (hi - lo) / 10
    bins = np.minimum(np.floor((y - lo) / width).astype(np.int64), 9)
    counts = np.bincount(bins, minlength=10)
    total = 0.0
    for c in counts:
        if c > 0:
            p = c / y.size
            total += p * math.log(p)
    assert binned_entropy(y, 10) == -total


def test_wave8_registry_complete():
    from anofox_forecast_ray.pipelines.queries_wave8 import (
        build_wave8_queries,
    )

    q, o = build_wave8_queries()
    assert set(q) == {
        "gapfill_linear_w8", "doc_sanitize_fill", "forecast_adida_w8",
        "forecast_imapa_w8", "doc_pacf_w8", "doc_binned_entropy",
        "events_infer_freq",
    }
    assert set(o) == set(q)
