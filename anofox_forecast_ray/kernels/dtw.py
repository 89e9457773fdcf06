"""Dynamic time warping distance over integer series.

Classic O(n*m) DP (Sakoe & Chiba 1978) with |a - b| integer cost, so the
whole matrix is int64 arithmetic and a DuckDB recursive-CTE oracle can
replay it bit-for-bit (same boundary sentinel, same least() tie
behavior — min of ints is order-free).

Beyond-the-reference operator: the reference's similarity layer stops at
lockstep metrics (MAE/MSE over aligned indices, src/metrics); DTW aligns
series of DIFFERENT lengths, which is what comparing per-source rollup
profiles needs (sources have different max document lengths).

Scale shape: the per-source series table is bounded (sources x windows,
the same bounded-cardinality argument as the source rollup), the global
reference series broadcasts once via ray.put, and each source's DP runs
inside groupby(source).map_groups — no pairwise all-to-all. For long
series use the banded variant (band r makes it O(n*r))."""

from __future__ import annotations

import numpy as np

BIG = 1 << 60  # unreachable-cell sentinel; never wins a least() on a
               # reachable cell and never overflows int64 when added


def dtw_int(x: np.ndarray, y: np.ndarray) -> int:
    """Exact integer DTW distance between int series x (len n) and y
    (len m). Rows are 1-indexed length m+1 with position 0 holding the
    j=0 boundary — identical layout to the SQL replay."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    m = y.size
    prev = np.full(m + 1, BIG, dtype=np.int64)
    prev[0] = 0
    for i in range(x.size):
        curr = np.empty(m + 1, dtype=np.int64)
        curr[0] = BIG
        xi = x[i]
        for j in range(1, m + 1):
            c = abs(int(xi) - int(y[j - 1]))
            curr[j] = c + min(prev[j], curr[j - 1], prev[j - 1])
        prev = curr
    return int(prev[m])


def dtw_int_banded(x: np.ndarray, y: np.ndarray, band: int) -> int:
    """Sakoe-Chiba banded DTW: cells with |i*m/n - j| > band are left at
    the sentinel, making the DP O(n*band). The scale path for series
    with thousands of windows; NOT bit-equal to dtw_int when the band
    clips the optimal path (by construction), so the oracle-checked
    query uses the exact kernel and this one is property-tested
    (band >= max(n, m) => identical to exact)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n, m = x.size, y.size
    prev = np.full(m + 1, BIG, dtype=np.int64)
    prev[0] = 0
    for i in range(1, n + 1):
        curr = np.full(m + 1, BIG, dtype=np.int64)
        center = i * m // max(n, 1)
        lo = max(1, center - band)
        hi = min(m, center + band)
        xi = int(x[i - 1])
        for j in range(lo, hi + 1):
            c = abs(xi - int(y[j - 1]))
            curr[j] = c + min(prev[j], curr[j - 1], prev[j - 1])
        prev = curr
    return int(prev[m])
