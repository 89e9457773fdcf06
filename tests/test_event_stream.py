"""Event-time tumbling windows: watermark advancement, late-data
policies (upsert vs drop), and batch-equality of the flushed result."""

import numpy as np
import pyarrow as pa
import pytest


def _feed(rows):
    k, ts, c = zip(*rows)
    return pa.table(
        {
            "key": pa.array(list(k), type=pa.string()),
            "ts_us": pa.array(list(ts), type=pa.int64()),
            "cents": pa.array(list(c), type=pa.int64()),
        }
    )


W = 100  # window_us


@pytest.mark.usefixtures("ray_session")
def test_upsert_policy_bitwise_equals_batch():
    from anofox_forecast_ray.stages.event_stream import (
        StreamingEventWindows,
        _combine,
        partials_from_events,
    )

    rng = np.random.default_rng(5)
    rows = [("k%d" % rng.integers(3), int(rng.integers(0, 1000)),
             int(rng.integers(-50, 50))) for _ in range(400)]
    s = StreamingEventWindows(window_us=W, allowed_lateness_us=0,
                              n_buckets=2, policy="upsert")
    try:
        # worst-case arrival: reverse event-time order
        ordered = sorted(rows, key=lambda r: r[1], reverse=True)
        for off in range(0, len(ordered), 37):
            s.ingest(_feed(ordered[off:off + 37]))
        got = s.flush()
        assert s.late_dropped() == 0
    finally:
        s.shutdown()
    want = _combine(partials_from_events(_feed(rows), W))
    gd = got.to_pandas().sort_values(["key", "window_id"]).reset_index(drop=True)
    wd = want.to_pandas().sort_values(["key", "window_id"]).reset_index(drop=True)
    assert gd.equals(wd)


@pytest.mark.usefixtures("ray_session")
def test_drop_policy_accounting_and_watermark():
    from anofox_forecast_ray.stages.event_stream import (
        StreamingEventWindows,
    )

    s = StreamingEventWindows(window_us=W, allowed_lateness_us=50,
                              n_buckets=1, policy="drop")
    try:
        # window 0: [0, 100); window 5: [500, 600)
        s.ingest(_feed([("a", 10, 1), ("a", 20, 2)]))
        # advances max_ts to 20 -> watermark -30: nothing finalized
        assert s.finalized_count() == 0
        s.ingest(_feed([("a", 580, 5)]))
        # watermark BEFORE this batch was -30, so window 0 still open;
        # now max_ts 580 -> watermark 530
        s.ingest(_feed([("a", 590, 7)]))
        # watermark 530 -> window 0 (end 100) finalized on this ingest
        assert s.finalized_count() >= 1
        # a straggler for window 0 is now LATE -> dropped and counted
        s.ingest(_feed([("a", 30, 100)]))
        assert s.late_dropped() == 1
        out = s.flush().to_pandas().set_index("window_id")
        # window 0 excludes the dropped event
        assert out.loc[0, "cnt"] == 2 and out.loc[0, "sum_cents"] == 3
        assert out.loc[5, "cnt"] == 2 and out.loc[5, "sum_cents"] == 12
    finally:
        s.shutdown()


def test_hopping_partials():
    from anofox_forecast_ray.stages.event_stream import (
        partials_from_events,
    )

    # W=100, S=50: event at ts=120 covers windows [50,150) (w=1) and
    # [100,200) (w=2)
    t = _feed([("a", 120, 7)])
    p = partials_from_events(t, 100, 50).to_pandas().set_index("window_id")
    assert sorted(p.index) == [1, 2]
    assert (p["cnt"] == 1).all() and (p["sum_cents"] == 7).all()
    with pytest.raises(ValueError):
        partials_from_events(t, 100, 30)


@pytest.mark.usefixtures("ray_session")
def test_hopping_stream_equals_batch():
    from anofox_forecast_ray.stages.event_stream import (
        StreamingEventWindows,
        partials_from_events,
    )

    rng = np.random.default_rng(6)
    rows = [("k%d" % rng.integers(2), int(rng.integers(0, 800)),
             int(rng.integers(0, 20))) for _ in range(200)]
    s = StreamingEventWindows(window_us=W, slide_us=W // 2,
                              allowed_lateness_us=0, n_buckets=2,
                              policy="upsert")
    try:
        ordered = sorted(rows, key=lambda r: r[1], reverse=True)
        for off in range(0, len(ordered), 23):
            s.ingest(_feed(ordered[off:off + 23]))
        got = s.flush()
    finally:
        s.shutdown()
    want = partials_from_events(_feed(rows), W, W // 2)
    gd = got.to_pandas().sort_values(["key", "window_id"]).reset_index(drop=True)
    wd = want.to_pandas().sort_values(["key", "window_id"]).reset_index(drop=True)
    assert gd.equals(wd)


@pytest.mark.usefixtures("ray_session")
def test_within_lateness_not_late():
    from anofox_forecast_ray.stages.event_stream import (
        StreamingEventWindows,
    )

    s = StreamingEventWindows(window_us=W, allowed_lateness_us=1000,
                              n_buckets=1, policy="drop")
    try:
        s.ingest(_feed([("a", 900, 1)]))
        s.ingest(_feed([("a", 10, 2)]))  # old, but within lateness
        assert s.late_dropped() == 0
        out = s.flush().to_pandas().set_index("window_id")
        assert out.loc[0, "cnt"] == 1 and out.loc[9, "cnt"] == 1
    finally:
        s.shutdown()
