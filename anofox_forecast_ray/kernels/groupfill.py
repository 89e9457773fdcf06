"""Vectorized MULTI-group kernels for the events family.

``groupby(user).map_groups(fn)`` costs one Python/pandas dispatch per
group — 1,500 users = 1,500 UDF calls, and at 100x the users the driver
stage is pure dispatch overhead. These kernels process EVERY group in a
batch with flat NumPy (boundary masks + cumsum/repeat index arithmetic),
so the engine can group by a small hash BUCKET of the key (same single
shuffle, ~64 calls instead of N_groups) and stay vectorized inside.

Inputs are sorted by (group, order-column); group boundaries are derived
from adjacent-inequality masks. All value arithmetic is identical to the
per-group kernels (LOCF copies observed doubles; rolling sums/z-scores
use the same exact-int formulas), so oracle hashes are unchanged.
"""

from __future__ import annotations

import numpy as np


def _group_bounds(codes: np.ndarray):
    """codes sorted; returns (starts, ends, n_groups)."""
    if codes.size == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, 0
    starts = np.flatnonzero(
        np.concatenate(([True], codes[1:] != codes[:-1]))
    )
    ends = np.concatenate((starts[1:], [codes.size]))
    return starts, ends, starts.size


def locf_fill_multi(codes: np.ndarray, window_ids: np.ndarray,
                    values: np.ndarray, start: int | None = None,
                    drop_leading_nan: bool = True):
    """LOCF gap-fill for MANY series at once.

    codes: per-observation group code (sorted); window_ids sorted within
    each group; start=None anchors each grid at the group's first
    observed window (reference fill_gaps first..last), an int anchors at
    that window. Returns (row_idx, window_id, value, filled) where
    row_idx indexes the ORIGINAL observation rows' group (use it to look
    up key columns).
    """
    starts, ends, ng = _group_bounds(codes)
    if ng == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0), np.zeros(0, dtype=bool)
    first_w = window_ids[starts]
    last_w = window_ids[ends - 1]
    if start is None:
        g_start = first_w
    else:
        # fixed anchor must not exceed any group's first observation
        # (callers use start=0 with non-negative windows)
        g_start = np.full(ng, start, dtype=np.int64)
    sizes = last_w - g_start + 1
    offs = np.concatenate(([0], np.cumsum(sizes)))
    total = int(offs[-1])
    grp_of_out = np.repeat(np.arange(ng), sizes)
    out_wid = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offs[:-1], sizes)
        + np.repeat(g_start, sizes)
    )
    grp_of_obs = np.repeat(np.arange(ng), ends - starts)
    obs_pos = offs[:-1][grp_of_obs] + (window_ids - g_start[grp_of_obs])
    filled = np.ones(total, dtype=bool)
    filled[obs_pos] = False
    marker = np.full(total, -1, dtype=np.int64)
    marker[obs_pos] = np.arange(obs_pos.size)
    last_obs = np.maximum.accumulate(marker)
    # a fill must come from the SAME group (leading grid cells before a
    # group's first observation stay NaN and are dropped / kept per flag)
    valid = last_obs >= 0
    src_grp = np.where(valid, grp_of_obs[np.maximum(last_obs, 0)], -1)
    valid &= src_grp == grp_of_out
    out_val = np.where(valid, values[np.maximum(last_obs, 0)], np.nan)
    row_idx = starts[grp_of_out]  # an original row of the same group
    if drop_leading_nan:
        keep = valid
        return row_idx[keep], out_wid[keep], out_val[keep], filled[keep]
    return row_idx, out_wid, out_val, filled


def rolling_mean_multi(codes: np.ndarray, cents: np.ndarray, window: int):
    """Trailing rolling mean of exact-int cents per group (warm-up
    dropped). Returns (mask_of_input_rows, rolling_mean) — mask selects
    the rows (sorted order) that have a full window."""
    n = codes.size
    c = np.concatenate(([0.0], np.cumsum(cents.astype(np.float64))))
    pos = np.arange(n)
    starts, ends, ng = _group_bounds(codes)
    pos_in_group = pos - np.repeat(starts, ends - starts)
    ok = pos_in_group >= window - 1
    s = c[pos + 1] - c[np.maximum(pos + 1 - window, 0)]
    rm = s / window
    return ok, rm


def sessionize_multi(codes: np.ndarray, tus: np.ndarray, gap_us: int):
    """Session ids per row: new session when the in-group gap exceeds
    gap_us. Returns per-row session_id (0-based within group)."""
    n = codes.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    new = np.ones(n, dtype=bool)
    same = codes[1:] == codes[:-1]
    new[1:] = ~same | (tus[1:] - tus[:-1] > gap_us)
    # cumulative session count, reset per group: global cumsum minus the
    # value at each group's first row
    cs = np.cumsum(new) - 1
    starts, ends, _ = _group_bounds(codes)
    base = np.repeat(cs[starts], ends - starts)
    return cs - base


def zscore_multi(codes: np.ndarray, cents: np.ndarray):
    """Per-group z-scores from exact integer sums (identical formula to
    the per-group kernel / SQL oracle). Returns the z array."""
    starts, ends, ng = _group_bounds(codes)
    if ng == 0:
        return np.zeros(0)
    counts = (ends - starts).astype(np.float64)
    s = np.add.reduceat(cents.astype(np.float64), starts)
    ss = np.add.reduceat((cents * cents).astype(np.float64), starts)
    mean = s / counts
    var = (ss - s * s / counts) / counts
    std = np.sqrt(np.maximum(var, 0.0))
    rep = ends - starts
    mean_r = np.repeat(mean, rep)
    std_r = np.repeat(std, rep)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(std_r > 0, np.abs(cents - mean_r) / std_r, 0.0)
    return z
