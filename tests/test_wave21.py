"""Wave-21: incremental continuous-aggregate refresh, merge semigroup,
LTTB downsample."""

import numpy as np
import pyarrow as pa
import pytest

from anofox_forecast_ray.kernels.rollup import (
    lttb_select,
    merge_window_rows,
    rollup_flat,
    rollup_flat_at,
)
from anofox_forecast_ray.stages.rollup import make_incremental_refresh_fn


def _random_ragged(rng, n_rows, max_len):
    lengths = rng.integers(0, max_len, size=n_rows)
    values = rng.integers(0, 1_000, size=int(lengths.sum())).astype(np.int32)
    return values, lengths.astype(np.int64)


def test_rollup_flat_at_zero_offset_matches_rollup_flat():
    rng = np.random.default_rng(7)
    values, lengths = _random_ragged(rng, 40, 50)
    a = rollup_flat(values, lengths, 8)
    b = rollup_flat_at(values, lengths, np.zeros(lengths.size, np.int64), 8)
    for k in ("row_idx", "window_id", "cnt", "sum", "min", "max"):
        np.testing.assert_array_equal(a[k], b[k])


@pytest.mark.parametrize("width", [1, 3, 8])
def test_incremental_refresh_equals_full_recompute(width):
    """Base rollup + offset delta rollup merged via the semigroup must be
    bitwise what a full rollup over all tokens emits — for every split
    point, including splits on and off window boundaries."""
    rng = np.random.default_rng(11)
    values, lengths = _random_ragged(rng, 30, 40)
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    full = rollup_flat(values, lengths, width)
    for num, den in ((3, 4), (1, 2), (0, 1), (1, 1)):
        split = (lengths * num) // den
        dlen = lengths - split
        b_off = np.concatenate(([0], np.cumsum(split)))
        b_take = np.repeat(starts, split) + (
            np.arange(int(b_off[-1])) - np.repeat(b_off[:-1], split)
        )
        d_off = np.concatenate(([0], np.cumsum(dlen)))
        d_take = np.repeat(starts + split, dlen) + (
            np.arange(int(d_off[-1])) - np.repeat(d_off[:-1], dlen)
        )
        base = rollup_flat(values[b_take], split, width)
        delta = rollup_flat_at(values[d_take], dlen, split, width)
        got = merge_window_rows(
            np.concatenate((base["row_idx"], delta["row_idx"])),
            np.concatenate((base["window_id"], delta["window_id"])),
            np.concatenate((base["cnt"], delta["cnt"])),
            np.concatenate((base["sum"], delta["sum"])),
            np.concatenate((base["min"], delta["min"])),
            np.concatenate((base["max"], delta["max"])),
        )
        for g, k in zip(got, ("row_idx", "window_id", "cnt", "sum",
                              "min", "max")):
            np.testing.assert_array_equal(g, full[k], err_msg=f"{num}/{den} {k}")


def test_incremental_refresh_stage_batch():
    batch = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "tokens": pa.array(
                [list(range(20)), [5], []], type=pa.list_(pa.int32())
            ),
            "source": ["s", "s", "t"],
        }
    )
    out = make_incremental_refresh_fn(8)(batch)
    full = rollup_flat(
        np.concatenate((np.arange(20, dtype=np.int32), [np.int32(5)])),
        np.array([20, 1, 0], dtype=np.int64),
        8,
    )
    np.testing.assert_array_equal(
        out.column("window_id").to_numpy(), full["window_id"]
    )
    np.testing.assert_array_equal(out.column("cnt").to_numpy(), full["cnt"])
    np.testing.assert_array_equal(out.column("sum").to_numpy(), full["sum"])
    assert out.column("doc_id").to_pylist() == ["a", "a", "a", "b"]


def _lttb_reference(y, n_out):
    """Straightforward per-step reference with Python ints (no numpy
    overflow concerns) and explicit bucket-membership formula."""
    n = len(y)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2
    interior = n - 2
    buckets = [[] for _ in range(nb)]
    for i in range(1, n - 1):
        buckets[((i - 1) * nb) // interior].append(i)
    sel = [0]
    ax = 0
    for k in range(nb):
        if k + 1 < nb:
            tgt = buckets[k + 1]
            m = len(tgt)
            sx = sum(tgt)
            sy = sum(int(y[i]) for i in tgt)
        else:
            m, sx, sy = 1, n - 1, int(y[n - 1])
        ay = int(y[ax])
        best, best_score = None, -1
        for i in buckets[k]:
            score = abs(
                (ax * m - sx) * (int(y[i]) - ay)
                - (ax - i) * (sy - ay * m)
            )
            if score > best_score:
                best, best_score = i, score
        sel.append(best)
        ax = best
    sel.append(n - 1)
    return sel


@pytest.mark.parametrize("n", [13, 20, 100, 997])
def test_lttb_matches_reference(n):
    rng = np.random.default_rng(n)
    y = rng.integers(0, 9_000, size=n).astype(np.int64)
    got = lttb_select(y, 12)
    assert got.tolist() == _lttb_reference(y, 12)


def test_lttb_short_series_keeps_all():
    y = np.arange(12, dtype=np.int64)
    assert lttb_select(y, 12).tolist() == list(range(12))


def test_lttb_invariants():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 100, size=50).astype(np.int64)
    sel = lttb_select(y, 12)
    assert sel.size == 12
    assert sel[0] == 0 and sel[-1] == 49
    assert (np.diff(sel) > 0).all()
    # spike always survives: put a huge outlier mid-series
    y2 = y.copy()
    y2[25] = 1_000_000
    assert 25 in lttb_select(y2, 12).tolist()
