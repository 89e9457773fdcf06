"""Property-based tests (hypothesis), mirroring the reference's proptest
suite (tests/property_tests.rs:27-60 strategies) and FIXTURES.md §5
invariants."""

import numpy as np
from hypothesis import given, settings, strategies as st

from anofox_forecast_ray.kernels.gorilla import gorilla_decode, gorilla_encode_fast
from anofox_forecast_ray.kernels.rollup import compact_partials, rollup_flat
from anofox_forecast_ray.models import (
    SES,
    HistoricAverage,
    Naive,
    RandomWalkWithDrift,
    SeasonalNaive,
    Theta,
)

finite_series = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=8, max_size=80,
).map(lambda xs: np.array(xs, dtype=np.float64))

positive_series = st.lists(
    st.floats(min_value=0.1, max_value=1e5, allow_nan=False,
              allow_infinity=False),
    min_size=16, max_size=80,
).map(lambda xs: np.array(xs, dtype=np.float64))


@settings(max_examples=40, deadline=None)
@given(y=finite_series, horizon=st.integers(1, 12))
def test_forecast_length_and_finiteness(y, horizon):
    for model in (Naive(), SES(alpha=0.5), HistoricAverage(),
                  RandomWalkWithDrift()):
        pred = model.fit(y).predict(horizon)
        assert pred.shape == (horizon,)
        assert np.isfinite(pred).all()


@settings(max_examples=40, deadline=None)
@given(y=finite_series, horizon=st.integers(1, 12))
def test_interval_ordering(y, horizon):
    for model in (Naive(), SES(alpha=0.3), SeasonalNaive(period=4)):
        point, lo, hi = model.fit(y).predict_with_intervals(horizon, 0.95)
        assert (lo <= point + 1e-12).all()
        assert (point <= hi + 1e-12).all()


@settings(max_examples=40, deadline=None)
@given(y=positive_series)
def test_fitted_plus_residuals_reconstruct(y):
    for model in (Naive(), SES(alpha=0.5), Theta()):
        m = model.fit(y)
        fitted = m.fitted_values()
        residuals = m.residuals()
        ok = np.isfinite(fitted) & np.isfinite(residuals)
        # skip index 0 where the reference pins residual=0 by convention
        ok[0] = False
        np.testing.assert_allclose(
            fitted[ok] + residuals[ok], y[ok], rtol=1e-9, atol=1e-9
        )


@settings(max_examples=30, deadline=None)
@given(
    tokens=st.lists(st.integers(0, 50256), min_size=1, max_size=400),
    width=st.sampled_from([2, 4, 8, 16]),
)
def test_rollup_cnt_and_sum_invariants(tokens, width):
    v = np.array(tokens, dtype=np.int32)
    r = rollup_flat(v, np.array([v.size]), width)
    assert int(r["cnt"].sum()) == v.size
    assert int(r["sum"].sum()) == int(v.astype(np.int64).sum())
    assert (r["min"] >= v.min()).all() and (r["max"] <= v.max()).all()


@settings(max_examples=30, deadline=None)
@given(
    tokens=st.lists(st.integers(0, 50256), min_size=8, max_size=400),
    factor=st.sampled_from([2, 4]),
)
def test_tier_compaction_recomputes_exactly(tokens, factor):
    v = np.array(tokens, dtype=np.int32)
    lengths = np.array([v.size])
    fine = rollup_flat(v, lengths, 4)
    n_fine = np.array([fine["window_id"].size])
    _, cid, cnt, s, mn, mx = compact_partials(
        fine["window_id"], fine["cnt"], fine["sum"], fine["min"],
        fine["max"], n_fine, factor,
    )
    direct = rollup_flat(v, lengths, 4 * factor)
    assert cid.tolist() == direct["window_id"].tolist()
    assert cnt.tolist() == direct["cnt"].tolist()
    assert s.tolist() == direct["sum"].tolist()
    assert mn.tolist() == direct["min"].tolist()
    assert mx.tolist() == direct["max"].tolist()


@settings(max_examples=30, deadline=None)
@given(
    bits=st.lists(st.integers(-(2**63), 2**63 - 1), min_size=0, max_size=300),
    deltas=st.lists(st.integers(1, 10**7), min_size=0, max_size=300),
)
def test_gorilla_roundtrip_random_bits(bits, deltas):
    n = min(len(bits), len(deltas))
    vals = np.array(bits[:n], dtype=np.int64).view(np.float64)
    ts = np.cumsum(np.array(deltas[:n], dtype=np.int64))
    blob = gorilla_encode_fast(ts, vals)
    ts2, vals2 = gorilla_decode(blob)
    assert ts2.tolist() == ts.tolist()
    assert vals2.view(np.int64).tolist() == vals.view(np.int64).tolist()
