"""Missing-value kernels: LOCF, linear interpolation, grid densification.

Reference semantics (reimplemented, not ported):
- ``sanitize``      -> TimeSeries::sanitized, src/core/time_series.rs:608-704
  (policies Drop / Fill / ForwardFill / Error; non-finite counts as missing;
  ForwardFill leaves leading missing as NaN)
- ``interpolate``   -> interpolate_series, src/core/time_series.rs:1063-1117
  (linear across interior runs, t=(j+1)/segments; edge runs take the nearest
  valid value only when ``fill_edges``)
- ``fill_gaps_grid``-> fill_gaps, src/core/time_series.rs:871-932 (dense grid
  first..last, NaN inserted at holes) — generalized here to integer window
  grids.

All vectorized NumPy; values are float64 with NaN in-band (no masks), per
the reference's representation (SURVEY.md §1.2).
"""

from __future__ import annotations

import numpy as np


def _missing_mask(y: np.ndarray) -> np.ndarray:
    return ~np.isfinite(y)


def locf(y: np.ndarray) -> np.ndarray:
    """Last-observation-carried-forward; leading missing stay NaN."""
    y = np.asarray(y, dtype=np.float64)
    valid = np.isfinite(y)
    idx = np.where(valid, np.arange(y.size), -1)
    np.maximum.accumulate(idx, out=idx)
    out = np.where(idx >= 0, y[np.maximum(idx, 0)], np.nan)
    return out


def sanitize(y: np.ndarray, policy: str = "forward_fill", fill_value: float = 0.0):
    """Apply a MissingValuePolicy. Returns (values, kept_index or None).

    policy: "drop" | "fill" | "forward_fill" | "error".
    For "drop" the second element is the index of kept positions.
    """
    y = np.asarray(y, dtype=np.float64)
    miss = _missing_mask(y)
    if policy == "error":
        if miss.any():
            raise ValueError("series contains missing values")
        return y, None
    if policy == "drop":
        keep = np.flatnonzero(~miss)
        return y[keep], keep
    if policy == "fill":
        return np.where(miss, fill_value, y), None
    if policy == "forward_fill":
        return locf(y), None
    raise ValueError(f"unknown policy {policy!r}")


def interpolate(y: np.ndarray, fill_edges: bool = False) -> np.ndarray:
    """Linear interpolation of interior missing runs.

    Interior run between valid y[i] and y[k] gets
    ``y[i] + (y[k]-y[i]) * (j-i)/(k-i)`` (== the reference's
    t=(j+1)/segments form). Edge runs: nearest valid value iff
    ``fill_edges``, else left NaN.
    """
    y = np.asarray(y, dtype=np.float64)
    valid = np.isfinite(y)
    if not valid.any():
        return np.full(y.shape, np.nan)
    xs = np.flatnonzero(valid)
    out = np.interp(np.arange(y.size, dtype=np.float64), xs, y[xs])
    if not fill_edges:
        out[: xs[0]] = np.nan
        out[xs[-1] + 1 :] = np.nan
    return out


def fill_gaps_grid(
    window_ids: np.ndarray,
    values: np.ndarray,
    start: int | None = None,
    stop: int | None = None,
):
    """Densify a sparse (window_id -> value) series onto the full grid.

    Returns (grid:int64, dense:float64 with NaN holes, filled:bool mask).
    Grid spans [start, stop]; defaults to [min(window_ids), max(window_ids)]
    like the reference's first..last fill_gaps.
    """
    window_ids = np.asarray(window_ids, dtype=np.int64)
    if window_ids.size == 0:
        z = np.zeros(0)
        return z.astype(np.int64), z, z.astype(bool)
    lo = int(window_ids.min()) if start is None else int(start)
    hi = int(window_ids.max()) if stop is None else int(stop)
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    dense = np.full(grid.size, np.nan)
    dense[window_ids - lo] = values
    filled = np.ones(grid.size, dtype=bool)
    filled[window_ids - lo] = False
    return grid, dense, filled


def gap_fill_series(
    window_ids: np.ndarray,
    values: np.ndarray,
    method: str = "locf",
    start: int | None = None,
    stop: int | None = None,
):
    """fill_gaps + (locf | linear | none) in one call.

    Returns (grid, filled_values, filled_mask). "linear" uses interior
    interpolation with edges LOCF'd forward (leading edge left NaN),
    matching fill_gaps->interpolated(fill_edges=False)->sanitized(locf)
    composition order of the reference pipeline.
    """
    grid, dense, filled = fill_gaps_grid(window_ids, values, start, stop)
    if method == "none":
        return grid, dense, filled
    if method == "locf":
        return grid, locf(dense), filled
    if method == "linear":
        return grid, locf(interpolate(dense, fill_edges=False)), filled
    raise ValueError(f"unknown gap-fill method {method!r}")
