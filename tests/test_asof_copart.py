"""VERDICT r4 item 2: co-partitioned as-of / range-join fallback.

The copart path must be bitwise-indistinguishable from the broadcast
path on the same input (the driver gate additionally pins it against
the DuckDB ASOF oracle via events_asof_purchase_copart), and
``asof_join_auto`` must route by right-side size.
"""

import numpy as np
import pyarrow as pa
import pytest


def _mk_sides(n_left=400, n_right=90, n_keys=23, seed=7):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, n_keys, n_left).astype(np.int64)
    lt = rng.integers(0, 10_000, n_left).astype(np.int64)
    rk = rng.integers(0, n_keys + 5, n_right).astype(np.int64)
    rt = rng.integers(0, 10_000, n_right).astype(np.int64)
    left = pa.table(
        {
            "event_id": pa.array(np.arange(n_left), type=pa.int64()),
            "user_id": pa.array(lk),
            "ts": pa.array(lt),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array(rk),
            "ts": pa.array(rt),
            "pay_a": pa.array(
                rng.integers(0, 1000, n_right).astype(np.int64)
            ),
            "pay_b": pa.array(rng.random(n_right)),
        }
    )
    return left, right


def _sorted(df):
    return df.sort_values("event_id").reset_index(drop=True)


def test_asof_copart_equals_broadcast(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.asof import (
        asof_join_broadcast,
        asof_join_copart,
    )

    left, right = _mk_sides()
    payload = {"pay_a": -1, "pay_b": -1.0}
    got_b = _sorted(
        asof_join_broadcast(
            rd.from_arrow(left), right, key="user_id", ts="ts",
            payload=payload, gap_col="gap_us",
        ).to_pandas()[["event_id", "user_id", "pay_a", "pay_b", "gap_us"]]
    )
    got_c = _sorted(
        asof_join_copart(
            rd.from_arrow(left), rd.from_arrow(right), key="user_id",
            ts="ts", payload=payload, gap_col="gap_us",
            left_cols=["event_id", "user_id"], n_buckets=8,
        ).to_pandas()[["event_id", "user_id", "pay_a", "pay_b", "gap_us"]]
    )
    assert got_b.equals(got_c)
    # spot semantics: strict predecessor only (no right ts >= left ts)
    assert (got_c["gap_us"] != 0).all()


def test_range_copart_equals_broadcast(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.asof import (
        range_count_broadcast,
        range_count_copart,
    )

    left, right = _mk_sides(seed=11)
    got_b = _sorted(
        range_count_broadcast(
            rd.from_arrow(left), right, key="user_id", ts="ts",
            window_us=500, out_col="n_in_range",
        ).to_pandas()[["event_id", "user_id", "n_in_range"]]
    )
    got_c = _sorted(
        range_count_copart(
            rd.from_arrow(left), rd.from_arrow(right), key="user_id",
            ts="ts", window_us=500, out_col="n_in_range",
            left_cols=["event_id", "user_id"], n_buckets=8,
        ).to_pandas()[["event_id", "user_id", "n_in_range"]]
    )
    assert got_b.equals(got_c)
    # brute-force truth on a sample of rows
    lk = left.column("user_id").to_numpy()
    lt = left.column("ts").to_numpy()
    rk = right.column("user_id").to_numpy()
    rt = right.column("ts").to_numpy()
    for i in (0, 17, 99, 333):
        truth = int(
            ((rk == lk[i]) & (rt >= lt[i] - 500) & (rt < lt[i])).sum()
        )
        assert int(got_c.loc[i, "n_in_range"]) == truth


def test_copart_empty_right(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.asof import asof_join_copart

    left, right = _mk_sides(n_right=90)
    empty_right = right.slice(0, 0)
    out = _sorted(
        asof_join_copart(
            rd.from_arrow(left), rd.from_arrow(empty_right),
            key="user_id", ts="ts", payload={"pay_a": -1},
            gap_col="gap_us", left_cols=["event_id", "user_id"],
        ).to_pandas()
    )
    assert len(out) == left.num_rows
    assert (out["pay_a"] == -1).all()
    assert (out["gap_us"] == -1).all()


def test_asof_auto_routes_by_size(ray_session):
    import ray.data as rd

    from anofox_forecast_ray.stages.asof import asof_join_auto

    left, right = _mk_sides(seed=3)
    payload = {"pay_a": -1, "pay_b": -1.0}
    # tiny limit -> copart; huge limit -> broadcast; results identical
    got_small = _sorted(
        asof_join_auto(
            rd.from_arrow(left), rd.from_arrow(right), key="user_id",
            ts="ts", payload=payload, gap_col="gap_us",
            broadcast_limit_rows=1,
        ).to_pandas()[["event_id", "pay_a", "pay_b", "gap_us"]]
    )
    got_big = _sorted(
        asof_join_auto(
            rd.from_arrow(left), right, key="user_id", ts="ts",
            payload=payload, gap_col="gap_us",
            broadcast_limit_rows=10**9,
        ).to_pandas()[["event_id", "pay_a", "pay_b", "gap_us"]]
    )
    assert got_small.equals(got_big)
