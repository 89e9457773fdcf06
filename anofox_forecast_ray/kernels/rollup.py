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


def rollup_flat_tiers(values: np.ndarray, lengths: np.ndarray, widths):
    """Tumbling rollups for several tier widths with exact cascade
    composition.

    The finest width is computed from raw (``rollup_flat``); every
    coarser width is composed from the LARGEST already-computed width
    that divides it via ``compact_partials``. The compose is the
    (cnt,sum,min,max) int semigroup — int64 adds and int32 extremes —
    so cascaded tiers are bitwise-identical to recomputing from raw
    (the same nesting property that makes tier compaction shuffle-free,
    SURVEY.md §7.4). A width that divides no computed width falls back
    to ``rollup_flat``.

    At tiers (8, 32, 128) this reads the flat token buffer once instead
    of three times — the composition reduceats touch n/8 and n/32
    elements — cutting the rollup/gorilla stages' memory traffic ~2.6x.

    Returns ``{width: r-dict}`` with each value shaped exactly like the
    ``rollup_flat`` result.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    results: dict[int, dict] = {}
    for w in sorted({int(x) for x in widths}):
        base_w = None
        for cand in sorted(results):
            # width-1 partials are identity windows: 24 B/token of
            # (cnt,sum,min,max) vs the 4 B/token raw read — never a
            # useful compose base
            if w != cand and cand > 1 and w % cand == 0:
                base_w = cand  # largest computed divisor wins
        if base_w is None:
            results[w] = rollup_flat(values, lengths, w)
            continue
        fine = results[base_w]
        n_win_fine = (lengths + base_w - 1) // base_w
        ri, win, cnt, s, mn, mx = compact_partials(
            fine["window_id"], fine["cnt"], fine["sum"],
            fine["min"], fine["max"], n_win_fine, w // base_w,
        )
        results[w] = {
            "row_idx": ri, "window_id": win, "cnt": cnt,
            "sum": s, "min": mn, "max": mx,
        }
    return results


def rollup_flat_at(
    values: np.ndarray,
    lengths: np.ndarray,
    start_pos: np.ndarray,
    width: int,
):
    """Tumbling-window rollup of rows whose first element sits at absolute
    position ``start_pos[row]`` (not 0). Windows stay defined on absolute
    positions, so the first and last windows of a row may be partial —
    this is the DELTA half of the incremental continuous-aggregate
    refresh: appended tokens land mid-window and their partials later
    merge with the stored boundary-window row via the (cnt,sum,min,max)
    semigroup.

    Within a row the emitted windows tile its value range exactly and
    rows are laid out contiguously, so the ``reduceat`` trick from
    ``rollup_flat`` still applies unchanged.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    start_pos = np.asarray(start_pos, dtype=np.int64)
    z = np.zeros(0, dtype=np.int64)
    empty = {
        "row_idx": z, "window_id": z, "cnt": z, "sum": z,
        "min": np.zeros(0, dtype=np.int32),
        "max": np.zeros(0, dtype=np.int32),
    }
    if lengths.size == 0 or int(lengths.sum()) == 0:
        return empty
    flat_starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    nz = lengths > 0
    first_win = start_pos // width
    last_win = (start_pos + np.maximum(lengths, 1) - 1) // width
    n_win = np.where(nz, last_win - first_win + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return empty
    row_idx = np.repeat(np.arange(lengths.size, dtype=np.int64), n_win)
    first_slot = np.concatenate(([0], np.cumsum(n_win)))[:-1]
    k = np.arange(total, dtype=np.int64) - np.repeat(first_slot, n_win)
    win = first_win[row_idx] + k
    row_start = start_pos[row_idx]
    row_end = (start_pos + lengths)[row_idx]
    seg_abs_start = np.maximum(win * width, row_start)
    seg_abs_end = np.minimum((win + 1) * width, row_end)
    seg_start = flat_starts[row_idx] + (seg_abs_start - row_start)
    seg_len = seg_abs_end - seg_abs_start
    v64 = values.astype(np.int64, copy=False)
    return {
        "row_idx": row_idx,
        "window_id": win,
        "cnt": seg_len,
        "sum": np.add.reduceat(v64, seg_start),
        "min": np.minimum.reduceat(values, seg_start).astype(
            np.int32, copy=False
        ),
        "max": np.maximum.reduceat(values, seg_start).astype(
            np.int32, copy=False
        ),
    }


def merge_window_rows(row_idx, window_id, cnt, sum_, min_, max_):
    """Merge partial window rows keyed (row, window_id) via the rollup
    semigroup: cnt/sum add, min/max extremize. Inputs are concatenations
    of any number of partial row sets (e.g. stored base rows + delta
    rows); output is sorted by (row, window_id) — exactly what a fresh
    rollup over the combined data would emit, by associativity of the
    integer partials.

    Returns (row_idx, window_id, cnt, sum, min, max).
    """
    if row_idx.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return (z, z, z, z,
                np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32))
    order = np.lexsort((window_id, row_idx))
    r = row_idx[order]
    w = window_id[order]
    change = np.empty(r.size, dtype=bool)
    change[0] = True
    change[1:] = (r[1:] != r[:-1]) | (w[1:] != w[:-1])
    seg = np.flatnonzero(change)
    return (
        r[seg],
        w[seg],
        np.add.reduceat(cnt[order], seg),
        np.add.reduceat(sum_[order], seg),
        np.minimum.reduceat(min_[order], seg),
        np.maximum.reduceat(max_[order], seg),
    )


def lttb_select(y: np.ndarray, n_out: int) -> np.ndarray:
    """Largest-Triangle-Three-Buckets downsample (Steinarsson 2013) of
    the series ``(x=0..n-1, y)`` to ``n_out`` points, integer-exact.

    Returns the selected indices (ascending). Deviations from the float
    original, chosen so a SQL oracle can replay the selection bitwise:

    - the triangle area vs the next bucket's MEAN point is scaled by the
      bucket size m (area·2·m), keeping every score an integer:
      ``|(ax·m − Σx)(y_i − y_a) − (ax − i)(Σy − y_a·m)|``
    - interior point i (1..n-2) belongs to bucket ``((i-1)·(n_out-2)) //
      (n-2)`` (floor division on both sides)
    - ties break to the smallest index (np.argmax first-max == an
      order-preserving strictly-greater SQL fold)

    Exact while ``n² · max|y|`` stays under 2^63 — n_windows ≤ ~2^18 for
    token sums; the oracle uses HUGEINT so any overflow would surface as
    a hash mismatch, not silent agreement.
    """
    y = np.asarray(y, dtype=np.int64)
    n = y.size
    if n <= n_out:
        return np.arange(n, dtype=np.int64)
    nb = n_out - 2          # interior buckets
    interior = n - 2
    # bucket k covers interior indices [edge(k), edge(k+1))
    ks = np.arange(nb + 1, dtype=np.int64)
    edges = 1 + (ks * interior + nb - 1) // nb
    ysum = np.concatenate(([0], np.cumsum(y)))
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    sel[-1] = n - 1
    ax = 0
    for k in range(nb):
        lo, hi = int(edges[k]), int(edges[k + 1])
        if k + 1 < nb:
            tlo, thi = int(edges[k + 1]), int(edges[k + 2])
            m = thi - tlo
            sx = (tlo + thi - 1) * m // 2
            sy = int(ysum[thi] - ysum[tlo])
        else:
            m, sx, sy = 1, n - 1, int(y[n - 1])
        ay = y[ax]
        cands = np.arange(lo, hi, dtype=np.int64)
        score = np.abs(
            (ax * m - sx) * (y[lo:hi] - ay) - (ax - cands) * (sy - ay * m)
        )
        ax = lo + int(np.argmax(score))
        sel[k + 1] = ax
    return sel


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
