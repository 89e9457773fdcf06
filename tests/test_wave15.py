"""Wave-15: funnel, cohort retention, hourly top types — edge shapes the
synthetic corpus never produces (boundary conversions, ties, users with
no entry step)."""

import numpy as np
import pyarrow as pa
import pytest

import anofox_forecast_ray.pipelines.queries_wave15 as w15

HOUR = w15.HOUR_US
DAY = w15.DAY_US


@pytest.fixture
def patch_events(monkeypatch):
    def _patch(table: pa.Table):
        import ray.data as rd

        monkeypatch.setattr(
            w15, "_events", lambda sf_dir, columns: rd.from_arrow(table)
        )

    return _patch


def _ev(rows):
    return pa.table(
        {
            "ts": pa.array([r[0] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )


def test_funnel_boundaries(ray_session, patch_events):
    W = 24 * HOUR
    rows = [
        # user 1: converts exactly at the window edge (inclusive)
        (1000, 1, "view"), (1000 + W, 1, "purchase"),
        # user 2: purchase one us past the window -> no conversion
        (2000, 2, "view"), (2000 + W + 1, 2, "purchase"),
        # user 3: purchase BEFORE first view only -> no conversion
        (5000, 3, "purchase"), (6000, 3, "view"),
        # user 4: purchases only -> never entered
        (7000, 4, "purchase"),
        # user 5: second view earlier than first-seen view row order
        (9000, 5, "view"), (8000, 5, "view"), (8500, 5, "purchase"),
        # noise types are pruned before the shuffle
        (1, 1, "error"), (2, 2, "click"),
    ]
    patch_events(_ev(rows))
    q, _ = w15._funnel_query()
    out = q("ignored").to_pandas()
    # entered: users 1,2,3,5; converted: 1 (edge) and 5 (8000->8500)
    assert int(out["entered"].iloc[0]) == 4
    assert int(out["converted"].iloc[0]) == 2
    assert out["rate"].iloc[0] == np.float64(2) / np.float64(4)


def test_funnel_no_entrants(ray_session, patch_events):
    patch_events(_ev([(1000, 1, "purchase"), (2000, 2, "click")]))
    q, _ = w15._funnel_query()
    out = q("ignored").to_pandas()
    assert int(out["entered"].iloc[0]) == 0
    assert int(out["converted"].iloc[0]) == 0
    assert np.isnan(out["rate"].iloc[0])


def test_cohort_offsets_and_dedup(ray_session, patch_events):
    rows = [
        # user 1: cohort day 0, active days 0,2 (day 0 repeated 3x)
        (10, 1, "view"), (20, 1, "view"), (30, 1, "view"),
        (2 * DAY + 5, 1, "view"),
        # user 2: cohort day 3, active days 3,4
        (3 * DAY, 2, "view"), (4 * DAY + 1, 2, "view"),
    ]
    patch_events(_ev(rows))
    q, _ = w15._cohort_query()
    out = (
        q("ignored").to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    want = [(0, 0, 1), (0, 2, 1), (3, 0, 1), (3, 1, 1)]
    got = list(
        zip(out["cohort_day"], out["day_offset"], out["n_users"])
    )
    assert got == want


def test_top_types_ties_and_short_hours(ray_session, patch_events):
    rows = (
        # hour 0: a=2, b=2, c=1, d=1 -> ties broken type-asc,
        # top3 = a(1), b(2), c(3)
        [(1, 1, "a"), (2, 1, "a"), (3, 1, "b"), (4, 1, "b"),
         (5, 1, "c"), (6, 1, "d")]
        # hour 1: single type -> only 1 row
        + [(HOUR + 1, 1, "z")]
    )
    patch_events(_ev(rows))
    q, _ = w15._hourly_top_types_query()
    out = (
        q("ignored").to_pandas()
        .sort_values(["hour_id", "rnk"])
        .reset_index(drop=True)
    )
    got = list(zip(out["hour_id"], out["event_type"], out["cnt"],
                   out["rnk"]))
    assert got == [
        (0, "a", 2, 1), (0, "b", 2, 2), (0, "c", 1, 3),
        (1, "z", 1, 1),
    ]
