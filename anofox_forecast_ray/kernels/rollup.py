"""Windowed continuous-aggregate kernels over ragged int token arrays.

Pure NumPy, no Ray. Operates on the *flat* representation of an Arrow
``list<int32>`` column: one ``values`` vector plus per-row ``offsets`` —
zero-copy out of ``pa.ListArray`` (SURVEY.md §1.4).

Semantics mirror the reference's rolling/feature aggregates
(src/transform/window.rs, src/features/basic.rs:40-151) re-expressed as
non-overlapping tumbling windows: for each series (doc) and window width
``w``, window k covers positions ``[k*w, min((k+1)*w, n))`` and yields
count / sum / min / max exactly (int64 / int32) and mean as ``sum/cnt``
derived only at emission (f64) — the int partials make tier compaction
bitwise associativity-proof (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np

ROLLUP_FIELDS = ("cnt", "sum", "min", "max")


def window_segments(lengths: np.ndarray, width: int):
    """Per-row tumbling-window segmentation of a ragged array.

    Given per-row lengths, returns (row_index, window_id, seg_start, seg_len)
    for every non-empty window, where seg_start indexes into the flat values
    vector (rows concatenated).

    All arrays are int64; vectorized (no Python loop over rows).
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    n_win = (lengths + width - 1) // width  # ceil-div; 0 for empty rows
    total = int(n_win.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z
    row_idx = np.repeat(np.arange(lengths.size, dtype=np.int64), n_win)
    # window index within its row: global arange minus each row's first slot
    first_slot = np.concatenate(([0], np.cumsum(n_win)))[:-1]
    win_id = np.arange(total, dtype=np.int64) - np.repeat(first_slot, n_win)
    seg_start = starts[row_idx] + win_id * width
    seg_end = np.minimum(seg_start + width, (starts + lengths)[row_idx])
    return row_idx, win_id, seg_start, seg_end - seg_start


def rollup_flat(values: np.ndarray, lengths: np.ndarray, width: int):
    """Tumbling-window count/sum/min/max over a ragged int array.

    Returns dict with row_idx, window_id, cnt(int64), sum(int64),
    min(int32), max(int32). Empty rows contribute no windows.
    """
    row_idx, win_id, seg_start, seg_len = window_segments(lengths, width)
    if row_idx.size == 0:
        return {
            "row_idx": row_idx,
            "window_id": win_id,
            "cnt": np.zeros(0, dtype=np.int64),
            "sum": np.zeros(0, dtype=np.int64),
            "min": np.zeros(0, dtype=np.int32),
            "max": np.zeros(0, dtype=np.int32),
        }
    v64 = values.astype(np.int64, copy=False)
    sums = np.add.reduceat(v64, seg_start)
    mins = np.minimum.reduceat(values, seg_start)
    maxs = np.maximum.reduceat(values, seg_start)
    return {
        "row_idx": row_idx,
        "window_id": win_id,
        "cnt": seg_len,
        "sum": sums,
        "min": mins.astype(np.int32, copy=False),
        "max": maxs.astype(np.int32, copy=False),
    }


def rollup_flat_masked(
    values: np.ndarray, lengths: np.ndarray, width: int, mask: np.ndarray
):
    """Tumbling-window aggregates over only the values where ``mask`` is True.

    Windows are still defined on the ORIGINAL positions (a window with zero
    qualifying values is emitted with cnt=0 so callers can drop it and later
    gap-fill). min/max for empty windows are int32 extremes (meaningless,
    dropped by callers).
    """
    row_idx, win_id, seg_start, seg_len = window_segments(lengths, width)
    if row_idx.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return {
            "row_idx": z, "window_id": z, "cnt": z, "sum": z,
            "min": np.zeros(0, dtype=np.int32),
            "max": np.zeros(0, dtype=np.int32),
        }
    m = mask.astype(bool, copy=False)
    v64 = np.where(m, values.astype(np.int64, copy=False), 0)
    cnts = np.add.reduceat(m.astype(np.int64), seg_start)
    sums = np.add.reduceat(v64, seg_start)
    lo = np.where(m, values, np.int32(np.iinfo(np.int32).max))
    hi = np.where(m, values, np.int32(np.iinfo(np.int32).min))
    mins = np.minimum.reduceat(lo, seg_start)
    maxs = np.maximum.reduceat(hi, seg_start)
    return {
        "row_idx": row_idx,
        "window_id": win_id,
        "cnt": cnts,
        "sum": sums,
        "min": mins.astype(np.int32, copy=False),
        "max": maxs.astype(np.int32, copy=False),
    }


def compact_partials(
    window_id: np.ndarray,
    cnt: np.ndarray,
    sum_: np.ndarray,
    min_: np.ndarray,
    max_: np.ndarray,
    row_lengths: np.ndarray,
    factor: int,
):
    """Compact fine-tier partials to a coarser tier (width *= factor).

    Input rows are grouped per series: ``row_lengths[i]`` fine windows for
    series i, each series' windows sorted ascending by ``window_id`` (the
    rollup kernel emits them that way). Algebraic partials compose:
    cnt/sum add, min/max extremize; coarse window_id = fine_id // factor.

    Returns (row_idx, coarse_window_id, cnt, sum, min, max).
    """
    coarse = window_id // factor
    row_lengths = np.asarray(row_lengths, dtype=np.int64)
    row_idx = np.repeat(np.arange(row_lengths.size, dtype=np.int64), row_lengths)
    if coarse.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return (z, z, z, z,
                np.zeros(0, dtype=min_.dtype), np.zeros(0, dtype=max_.dtype))
    # boundary wherever (series, coarse_id) changes
    change = np.empty(coarse.size, dtype=bool)
    change[0] = True
    change[1:] = (coarse[1:] != coarse[:-1]) | (row_idx[1:] != row_idx[:-1])
    seg_start = np.flatnonzero(change)
    return (
        row_idx[seg_start],
        coarse[seg_start],
        np.add.reduceat(cnt, seg_start),
        np.add.reduceat(sum_, seg_start),
        np.minimum.reduceat(min_, seg_start),
        np.maximum.reduceat(max_, seg_start),
    )


def m4_flat(values: np.ndarray, lengths: np.ndarray, width: int):
    """M4 downsample (first/last/min/max + arg positions) per tumbling
    window — the standard error-free visualization downsample (Jugel et
    al., VLDB 2014), here over the ragged token array.

    Tie-break is first occurrence, enforced by integer key encoding
    ``v * width + local_pos`` (min) / ``v * width + (width-1-local_pos)``
    (max) so a SQL oracle can replay the exact same selection. Positions
    are window-local (0-based).
    """
    row_idx, win_id, seg_start, seg_len = window_segments(lengths, width)
    w = np.int64(width)
    if row_idx.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return {k: z for k in ("row_idx", "window_id", "first_val",
                               "last_val", "min_val", "min_pos",
                               "max_val", "max_pos")}
    v64 = values.astype(np.int64, copy=False)
    local = np.arange(v64.size, dtype=np.int64) - np.repeat(
        seg_start, seg_len
    )
    minkey = np.minimum.reduceat(v64 * w + local, seg_start)
    maxkey = np.maximum.reduceat(v64 * w + (w - 1 - local), seg_start)
    return {
        "row_idx": row_idx,
        "window_id": win_id,
        "first_val": v64[seg_start],
        "last_val": v64[seg_start + seg_len - 1],
        "min_val": minkey // w,
        "min_pos": minkey % w,
        "max_val": maxkey // w,
        "max_pos": w - 1 - (maxkey % w),
    }
