"""Gorilla codec: bitwise round-trip property tests (FIXTURES.md §5)."""

import numpy as np
import pytest

from anofox_forecast_ray.kernels.gorilla import gorilla_decode, gorilla_encode


def roundtrip(ts, vals):
    blob = gorilla_encode(np.asarray(ts), np.asarray(vals))
    ts2, vals2 = gorilla_decode(blob)
    assert ts2.tolist() == list(ts)
    a = np.asarray(vals, dtype=np.float64).view(np.int64)
    b = vals2.view(np.int64)
    assert a.tolist() == b.tolist(), "bitwise value mismatch"
    return blob


def test_empty_and_single():
    roundtrip([], [])
    roundtrip([42], [3.14159])


def test_regular_grid_compresses_well():
    ts = np.arange(1000, dtype=np.int64)
    vals = np.full(1000, 101.5)
    blob = roundtrip(ts, vals)
    # constant values + unit deltas: ~2 bits/point after header
    assert len(blob) < 300


def test_random_walk():
    rng = np.random.default_rng(7)
    ts = np.cumsum(rng.integers(1, 100, 500)).astype(np.int64)
    vals = np.cumsum(rng.normal(0, 1, 500))
    roundtrip(ts, vals)


def test_special_floats_bitwise():
    vals = [0.0, -0.0, np.inf, -np.inf, np.nan, np.finfo(np.float64).max,
            np.finfo(np.float64).tiny, -np.finfo(np.float64).tiny, 1e-308]
    ts = list(range(len(vals)))
    roundtrip(ts, vals)


def test_nan_payload_bitwise():
    # distinct NaN bit patterns must survive
    a = np.array([np.float64(0)])
    nan1 = np.int64(0x7FF8000000000001).view(np.float64)
    nan2 = np.int64(0xFFF8DEADBEEF0001 - (1 << 64)).view(np.float64)
    roundtrip([0, 1, 2], [nan1, nan2, 1.0])


def test_negative_and_large_dod():
    ts = np.array([0, 1, 2, 10_000_000, 10_000_001, 5_000_000_000], dtype=np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    roundtrip(ts, vals)


def test_random_doubles_property():
    rng = np.random.default_rng(123)
    bits = rng.integers(-(2**63), 2**63, 2000, dtype=np.int64)
    vals = bits.view(np.float64)
    ts = np.cumsum(rng.integers(1, 5000, 2000)).astype(np.int64)
    roundtrip(ts, vals)


def test_fast_encoder_bitwise_roundtrip():
    from anofox_forecast_ray.kernels.gorilla import gorilla_encode_fast

    rng = np.random.default_rng(11)
    cases = [
        (np.arange(1000, dtype=np.int64), np.full(1000, 101.5)),
        (np.cumsum(rng.integers(1, 100, 500)).astype(np.int64),
         np.cumsum(rng.normal(0, 1, 500))),
        (np.arange(6, dtype=np.int64),
         np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308])),
        (np.cumsum(rng.integers(1, 5000, 3000)).astype(np.int64),
         rng.integers(-(2**63), 2**63, 3000, dtype=np.int64).view(np.float64)),
        (np.array([0, 1, 2, 10_000_000, 10_000_001, 5_000_000_000]),
         np.arange(6.0)),
    ]
    for ts, vals in cases:
        blob = gorilla_encode_fast(ts, vals)
        ts2, vals2 = gorilla_decode(blob)
        assert ts2.tolist() == ts.tolist()
        assert (
            np.asarray(vals).view(np.int64).tolist()
            == vals2.view(np.int64).tolist()
        )


def test_gorilla_stage_roundtrip_vs_rollup():
    from anofox_forecast_ray.config import SMALL_TIERS
    from anofox_forecast_ray.corpus import generate_corpus
    from anofox_forecast_ray.stages.gorilla_stage import (
        GorillaFromTokens,
        decode_blob_table,
    )
    from anofox_forecast_ray.stages.rollup import make_tier_rollup_fn

    corpus = generate_corpus(30, seed=9, mean_len=120, sigma=1.0)
    blobs = GorillaFromTokens(SMALL_TIERS)(corpus)
    decoded = decode_blob_table(blobs).to_pandas()
    rollup = make_tier_rollup_fn(SMALL_TIERS)(corpus).to_pandas()
    d = decoded.sort_values(["doc_id", "tier", "window_id"]).reset_index(drop=True)
    r = rollup.sort_values(["doc_id", "tier", "window_id"]).reset_index(drop=True)
    assert len(d) == len(r)
    assert (d["window_id"].to_numpy() == r["window_id"].to_numpy()).all()
    assert (
        d["value"].to_numpy().view(np.int64)
        == r["mean"].to_numpy().view(np.int64)
    ).all(), "decoded means not bitwise equal to rollup means"
    assert (blobs.column("n_pts").to_numpy(zero_copy_only=False) > 0).all()


def test_decode_many_matches_scalar_decode():
    """Lockstep decoder == per-blob decoder, bitwise, both encoder forms,
    across the hybrid's sequential/lockstep split (skewed lengths force
    long lanes onto the scalar path)."""
    from anofox_forecast_ray.kernels.gorilla import (
        gorilla_decode_many,
        gorilla_encode_fast,
    )

    rng = np.random.default_rng(11)
    blobs, expect = [], []

    def add(ts, vals, enc):
        b = enc(np.asarray(ts, dtype=np.int64),
                np.asarray(vals, dtype=np.float64))
        blobs.append(b)
        expect.append(gorilla_decode(b))

    add([], [], gorilla_encode)
    add([7], [np.nan], gorilla_encode)
    add([0, 1], [0.0, -0.0], gorilla_encode)
    add([10, 20, 30], [np.inf, -np.inf, 1e-308], gorilla_encode)
    add([2**40, 2**40 + 1, 2**40 + 10**6, -(2**40)], [1.5] * 4,
        gorilla_encode)
    for trial in range(40):
        # skew: every 8th blob is long, forcing the sequential-lane path
        n = int(rng.integers(500, 900)) if trial % 8 == 0 \
            else int(rng.integers(0, 60))
        ts = np.cumsum(rng.integers(-5000, 5000, size=n))
        vals = rng.normal(size=n)
        if trial % 3 == 0:
            vals = np.round(vals, 1)  # repeat xors -> reuse control path
        enc = gorilla_encode if trial % 2 else gorilla_encode_fast
        add(ts, vals, enc)

    off, wids, vals = gorilla_decode_many(blobs)
    assert off[-1] == sum(len(t) for t, _ in expect)
    for k, (t, v) in enumerate(expect):
        a, b = off[k], off[k + 1]
        assert np.array_equal(wids[a:b], t), f"blob {k} window_ids"
        assert np.array_equal(
            vals[a:b].view(np.uint64), v.view(np.uint64)
        ), f"blob {k} values"


def test_encode_many_byte_identical_to_scalar():
    """Batch lockstep encoder emits the EXACT bytes of gorilla_encode per
    lane across the cost-split (long lanes go scalar inside)."""
    from anofox_forecast_ray.kernels.gorilla import gorilla_encode_many

    rng = np.random.default_rng(13)
    lanes = [([], []), ([5], [3.25]), ([0, 1], [0.0, -0.0]),
             ([10, 20, 30], [np.nan, np.inf, -np.inf])]
    for trial in range(30):
        n = int(rng.integers(0, 120)) if trial % 7 else \
            int(rng.integers(700, 1500))
        ts = np.cumsum(rng.integers(-5000, 5000, size=n))
        vals = rng.normal(size=n)
        if trial % 3 == 0:
            vals = np.round(vals, 1)
        lanes.append((ts, vals))
    lanes = [(np.asarray(t, dtype=np.int64), np.asarray(v, dtype=np.float64))
             for t, v in lanes]
    flat_ts = np.concatenate([t for t, _ in lanes])
    flat_v = np.concatenate([v for _, v in lanes])
    off = np.zeros(len(lanes) + 1, dtype=np.int64)
    np.cumsum([len(t) for t, _ in lanes], out=off[1:])
    arr = gorilla_encode_many(flat_ts, flat_v, off)
    for k, (t, v) in enumerate(lanes):
        assert arr[k].as_py() == gorilla_encode(t, v), f"lane {k}"
