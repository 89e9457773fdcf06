"""Frequency strings, timestamp grids, frequency inference.

Reference semantics (src/core/time_series.rs):
- ``parse_frequency``    Frequency::parse (:42-81): Polars-style strings
  "30s"/"30m"/"1h"/"1d"/"1w" -> seconds; "1mo"/"1q" -> months; "1y" -> years
- ``generate_timestamps`` (:966-1011): inclusive start..end grid;
  month/year steps via ``add_months`` with month-end clamping (:1014-1039,
  Jan 31 + 1mo -> Feb 28/29)
- ``infer_frequency``    (:727-767): modal timestamp delta; error when the
  modal ratio is below the tolerance
- ``fill_gaps_timestamps``: densify a timestamped series onto the grid
  with NaN holes (:871-932 semantics on real timestamps)

Timestamps are int64 epoch-seconds (or datetime64[s]-compatible).
"""

from __future__ import annotations

import calendar
from dataclasses import dataclass
from datetime import datetime, timezone

import numpy as np


@dataclass(frozen=True)
class Frequency:
    kind: str   # "duration" | "months" | "years"
    value: int  # seconds for duration; count otherwise

    @property
    def seconds(self) -> int | None:
        return self.value if self.kind == "duration" else None


_UNITS = {
    **{u: ("duration", 1) for u in ("s", "sec", "second", "seconds")},
    **{u: ("duration", 60) for u in ("m", "min", "minute", "minutes")},
    **{u: ("duration", 3600) for u in ("h", "hr", "hour", "hours")},
    **{u: ("duration", 86400) for u in ("d", "day", "days")},
    **{u: ("duration", 604800) for u in ("w", "week", "weeks")},
    **{u: ("months", 1) for u in ("mo", "month", "months")},
    **{u: ("months", 3) for u in ("q", "quarter", "quarters")},
    **{u: ("years", 1) for u in ("y", "year", "years")},
}


def parse_frequency(s: str) -> Frequency:
    t = s.strip().lower()
    i = 0
    while i < len(t) and t[i].isdigit():
        i += 1
    if i == 0:
        raise ValueError(f"invalid frequency string: {s!r} (no number found)")
    num = int(t[:i])
    unit = t[i:]
    if unit not in _UNITS:
        raise ValueError(
            f"unknown frequency unit: {unit!r} (expected s, m, h, d, w, mo, q, or y)"
        )
    kind, mult = _UNITS[unit]
    if kind == "duration":
        return Frequency("duration", num * mult)
    return Frequency(kind, num * mult)


def add_months_epoch(epoch_s: int, months: int) -> int:
    """Add calendar months with month-end clamping (time_series.rs:1014)."""
    dt = datetime.fromtimestamp(epoch_s, tz=timezone.utc)
    total = dt.year * 12 + (dt.month - 1) + months
    year, month = divmod(total, 12)
    month += 1
    day = min(dt.day, calendar.monthrange(year, month)[1])
    return int(
        datetime(
            year, month, day, dt.hour, dt.minute, dt.second, tzinfo=timezone.utc
        ).timestamp()
    )


def generate_timestamps(start_s: int, end_s: int, freq: Frequency) -> np.ndarray:
    """Inclusive [start, end] grid of epoch-seconds."""
    if freq.kind == "duration":
        if freq.value <= 0:
            raise ValueError("frequency duration must be positive")
        return np.arange(start_s, end_s + 1, freq.value, dtype=np.int64)
    step = freq.value if freq.kind == "months" else freq.value * 12
    if step <= 0:
        raise ValueError("frequency months must be positive")
    out = []
    cur = int(start_s)
    while cur <= end_s:
        out.append(cur)
        cur = add_months_epoch(cur, step)
    return np.array(out, dtype=np.int64)


def infer_frequency(timestamps: np.ndarray, tolerance: float = 0.5) -> int:
    """Modal delta in seconds; raises if modal ratio < tolerance."""
    ts = np.asarray(timestamps, dtype=np.int64)
    if ts.size < 2:
        raise ValueError(f"need >= 2 timestamps, got {ts.size}")
    diffs = np.diff(ts)
    vals, counts = np.unique(diffs, return_counts=True)
    i = int(np.argmax(counts))
    if counts[i] / diffs.size < tolerance:
        raise ValueError("no unique modal spacing found")
    return int(vals[i])


class CalendarAnnotations:
    """Holidays + named exogenous regressors
    (src/core/time_series.rs:109-160). Holiday membership is by calendar
    DAY; business day = Mon-Fri and not a holiday. In Ray stages this is
    the broadcast small-side object (ray.put once, read in actors)."""

    def __init__(self, holidays=(), regressors: dict | None = None):
        # normalize holiday epochs to day ordinals for day-level matching
        self._holiday_days = frozenset(
            int(h) // 86400 for h in holidays
        )
        self.regressors = dict(regressors or {})

    def is_holiday(self, epoch_s: int) -> bool:
        return int(epoch_s) // 86400 in self._holiday_days

    def is_business_day(self, epoch_s: int) -> bool:
        # epoch day 0 (1970-01-01) was a Thursday; weekday index Mon=0
        weekday = (int(epoch_s) // 86400 + 3) % 7
        return weekday < 5 and not self.is_holiday(epoch_s)

    def business_day_mask(self, epochs: np.ndarray) -> np.ndarray:
        days = np.asarray(epochs, dtype=np.int64) // 86400
        weekday = (days + 3) % 7
        ok = weekday < 5
        if self._holiday_days:
            hol = np.array(sorted(self._holiday_days), dtype=np.int64)
            ok &= ~np.isin(days, hol)
        return ok

    def regressor(self, name: str):
        return self.regressors.get(name)

    @property
    def has_regressors(self) -> bool:
        return bool(self.regressors)


def infer_frequency_calendar(
    timestamps: np.ndarray,
    calendar: CalendarAnnotations | None = None,
    tolerance: float = 0.5,
) -> int:
    """Modal delta over business days only (time_series.rs:770-824)."""
    ts = np.asarray(timestamps, dtype=np.int64)
    if calendar is not None:
        ts = ts[calendar.business_day_mask(ts)]
    if ts.size < 2:
        raise ValueError(f"need >= 2 business-day timestamps, got {ts.size}")
    return infer_frequency(ts, tolerance)


def fill_gaps_timestamps(
    timestamps: np.ndarray, values: np.ndarray, freq: Frequency
):
    """Densify (timestamps, values) onto the full grid; NaN at holes.

    Returns (grid, dense_values, filled_mask). Observations that do not
    sit exactly on a grid point are NOT carried over — this matches the
    reference exactly (fill_gaps builds a timestamp->index map and only
    exact grid hits survive, time_series.rs:890-917); align/bucket
    timestamps first for irregular data.
    """
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    if ts.size == 0:
        return ts, vals, np.zeros(0, dtype=bool)
    grid = generate_timestamps(int(ts[0]), int(ts[-1]), freq)
    dense = np.full(grid.size, np.nan)
    idx = np.searchsorted(grid, ts)
    on_grid = (idx < grid.size) & (grid[np.minimum(idx, grid.size - 1)] == ts)
    dense[idx[on_grid]] = vals[on_grid]
    filled = np.ones(grid.size, dtype=bool)
    filled[idx[on_grid]] = False
    return grid, dense, filled
