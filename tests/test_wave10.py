"""Wave-10 tests: scale suite, expanding stats, OLS trend wiring."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.ols import ols_fit
from anofox_forecast_ray.kernels.scale import center, normalize, scale_to_range
from anofox_forecast_ray.kernels.windows import (
    expanding_max,
    expanding_min,
    expanding_sum,
)


def test_scale_trio_roundtrip_properties():
    y = np.array([4.0, 10.0, 7.0, 1.0])
    c, mu = center(y)
    assert mu == 5.5 and c.sum() == 0.0
    n01, mn, mx = normalize(y)
    assert (mn, mx) == (1.0, 10.0)
    assert n01.min() == 0.0 and n01.max() == 1.0
    rg, _, _ = scale_to_range(y, -1.0, 1.0)
    assert rg.min() == -1.0 and rg.max() == 1.0
    # constant series -> zero guard
    z, _, _ = normalize(np.full(5, 3.0))
    assert (z == 0).all()


def test_expanding_stats_exact():
    y = np.array([3.0, 1.0, 4.0, 1.0, 5.0])
    assert expanding_min(y).tolist() == [3, 1, 1, 1, 1]
    assert expanding_max(y).tolist() == [3, 3, 4, 4, 5]
    assert expanding_sum(y).tolist() == [3, 4, 8, 9, 14]


def test_ols_trend_recovers_line():
    t = np.arange(50, dtype=np.float64)
    y = 3.25 - 0.5 * t
    r = ols_fit(y, {"t": t})
    assert r.intercept == pytest.approx(3.25, abs=1e-10)
    assert r.coefficients[0] == pytest.approx(-0.5, abs=1e-12)


def test_wave10_registry_complete():
    from anofox_forecast_ray.pipelines.queries_wave10 import (
        build_wave10_queries,
    )

    q, o = build_wave10_queries()
    assert set(q) == {"doc_scale_suite", "doc_expanding_stats",
                      "doc_ols_trend", "retention_range_read",
                      "corpus_prep_pipeline", "multimodal_audio_features",
                      "multimodal_video_features"}
    assert set(o) == set(q)
