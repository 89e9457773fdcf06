"""Lockstep-vectorized forecast kernels: bitwise parity vs the per-series
path (kernels/forecast_vec.py vs models.* through ForecastFromTokens)."""

import numpy as np
import pyarrow as pa
import pytest

from anofox_forecast_ray.config import TierSpec
from anofox_forecast_ray.stages.forecast import ForecastFromTokens

MODELS = (
    ("seasonal_naive", {"period": 4}),
    ("ses", {"alpha": 0.5}),
    ("ets", {"spec": "AAN", "optimize": False, "alpha": 0.3, "beta": 0.1}),
    ("theta", {}),
)
TIERS = (TierSpec("w8", 8), TierSpec("w32", 32), TierSpec("w128", 128))


def _batch(lengths, rng):
    toks, offs = [], [0]
    for L in lengths:
        toks.extend(rng.integers(0, 5000, size=int(L)).tolist())
        offs.append(len(toks))
    tokens = pa.ListArray.from_arrays(
        pa.array(offs, type=pa.int32()), pa.array(toks, type=pa.int32())
    )
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(lengths))]),
            "tokens": tokens,
            "n_tok": pa.array([int(x) for x in lengths], type=pa.int32()),
            "source": pa.array(["s"] * len(lengths)),
        }
    )


def _assert_tables_bitwise(vec: pa.Table, scalar: pa.Table):
    assert vec.num_rows == scalar.num_rows
    assert vec.column_names == scalar.column_names
    for c in scalar.column_names:
        a = vec.column(c).to_numpy(zero_copy_only=False)
        b = scalar.column(c).to_numpy(zero_copy_only=False)
        if a.dtype.kind == "f":
            assert np.array_equal(
                a.view(np.uint64), b.view(np.uint64)
            ), f"column {c} differs in float bits"
        else:
            assert (a == b).all(), f"column {c} differs"


@pytest.mark.parametrize("horizon", [1, 3])
def test_vectorized_stage_bitwise_equals_scalar(horizon):
    rng = np.random.default_rng(5)
    cases = [
        # tier-width boundaries, sub-min_points docs, >512-window lanes
        # (the ses_scan algorithm boundary -> per-series fallback)
        [32, 100, 2000, 700, 31, 8, 64, 4096, 520 * 8, 513 * 8],
        list(rng.integers(1, 3000, size=150)),
        [8 * 4, 8 * 4 + 1, 8 * 5, 32 * 4, 128 * 4, 3, 7, 1],
    ]
    for lengths in cases:
        batch = _batch(lengths, rng)
        inst = ForecastFromTokens(TIERS, MODELS, horizon=horizon)
        assert inst._vec_plan is not None
        vec = inst._call_vectorized(batch)
        inst._vec_plan = None
        scalar = inst(batch)
        _assert_tables_bitwise(vec, scalar)


def test_seasonal_naive_short_series_nan_rows():
    """n < period lanes surface NaN rows exactly like the try/except."""
    rng = np.random.default_rng(9)
    # 4 tokens -> w8 tier has 1 window < min_points: skipped entirely;
    # 5 windows in w8 (40 tokens) but period 12 > 5 -> NaN rows for SN
    models = (("seasonal_naive", {"period": 12}), ("ses", {"alpha": 0.5}))
    batch = _batch([40, 200, 2000], rng)
    inst = ForecastFromTokens(TIERS, models)
    vec = inst._call_vectorized(batch)
    inst._vec_plan = None
    scalar = inst(batch)
    _assert_tables_bitwise(vec, scalar)
    sn = vec.filter(pa.compute.equal(vec.column("model"), "seasonal_naive"))
    assert any(np.isnan(sn.column("yhat").to_numpy(zero_copy_only=False)))


def test_unsupported_model_set_keeps_scalar_path():
    inst = ForecastFromTokens(TIERS, (("ses", {}),))  # optimized alpha
    assert inst._vec_plan is None
    inst2 = ForecastFromTokens(TIERS, (("theta", {"period": 12}),))
    assert inst2._vec_plan is None  # decomposition is data-dependent
    inst3 = ForecastFromTokens(TIERS, (("naive", {}),))
    assert inst3._vec_plan is None
