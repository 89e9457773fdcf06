"""PELT changepoint detection (Killick et al. 2012, public method).

Reference semantics: src/changepoint/pelt.rs:114-400 with segment cost
functions from src/changepoint/cost.rs:38-264 (l1 / l2 / normal
mean-variance). O(n) average via the pruning inequality; penalty defaults
to BIC-style ``p * log(n)``.

Cost functions (segment [s, e), all via prefix sums -> O(1) per segment):
- l2:     sum (x - segment_mean)^2
- normal: n_seg * (log(2*pi) + log(max(var, eps)) + 1)  (Gaussian NLL at MLE)
- l1:     sum |x - segment_median|  (O(log n) per eval via sorted insert is
          not worth it here; implemented with per-segment partition)
"""

from __future__ import annotations

import math

import numpy as np


class _L2Cost:
    def __init__(self, y: np.ndarray):
        self.c1 = np.concatenate(([0.0], np.cumsum(y)))
        self.c2 = np.concatenate(([0.0], np.cumsum(y * y)))

    def cost(self, s: int, e: int) -> float:
        n = e - s
        if n <= 0:
            return 0.0
        s1 = self.c1[e] - self.c1[s]
        s2 = self.c2[e] - self.c2[s]
        return s2 - s1 * s1 / n


class _NormalCost:
    def __init__(self, y: np.ndarray):
        self.c1 = np.concatenate(([0.0], np.cumsum(y)))
        self.c2 = np.concatenate(([0.0], np.cumsum(y * y)))

    def cost(self, s: int, e: int) -> float:
        n = e - s
        if n <= 0:
            return 0.0
        s1 = self.c1[e] - self.c1[s]
        s2 = self.c2[e] - self.c2[s]
        var = max((s2 - s1 * s1 / n) / n, 1e-10)
        return n * (math.log(2 * math.pi) + math.log(var) + 1.0)


class _L1Cost:
    def __init__(self, y: np.ndarray):
        self.y = y

    def cost(self, s: int, e: int) -> float:
        seg = self.y[s:e]
        if seg.size == 0:
            return 0.0
        med = np.median(seg)
        return float(np.abs(seg - med).sum())


class _PoissonCost:
    """Count-data NLL, simplified (cost.rs:97-113):
    n*mean - sum*ln(mean) = sum - sum*ln(mean)."""

    def __init__(self, y: np.ndarray):
        self.c1 = np.concatenate(([0.0], np.cumsum(y)))

    def cost(self, s: int, e: int) -> float:
        n = e - s
        if n <= 0:
            return 0.0
        total = self.c1[e] - self.c1[s]
        mean = total / n
        if mean < 1e-10:
            return 0.0
        return total - total * math.log(mean)


class _LinearTrendCost:
    """RSS of y = a + b*x per segment, x local 0..n-1 (cost.rs:116-152).
    O(1) via prefixes of y, y^2 and t*y (local x*y recovered by
    subtracting s * sum_y)."""

    def __init__(self, y: np.ndarray):
        self.c1 = np.concatenate(([0.0], np.cumsum(y)))
        self.c2 = np.concatenate(([0.0], np.cumsum(y * y)))
        t = np.arange(y.size, dtype=np.float64)
        self.cty = np.concatenate(([0.0], np.cumsum(t * y)))

    def cost(self, s: int, e: int) -> float:
        n = e - s
        if n < 2:
            return 0.0
        sum_y = self.c1[e] - self.c1[s]
        sum_y2 = self.c2[e] - self.c2[s]
        sum_xy = (self.cty[e] - self.cty[s]) - s * sum_y
        sum_x = n * (n - 1) / 2.0
        sum_x2 = (n - 1) * n * (2 * n - 1) / 6.0
        mean_x = sum_x / n
        mean_y = sum_y / n
        ss_xx = sum_x2 - n * mean_x * mean_x
        ss_xy = sum_xy - n * mean_x * mean_y
        ss_yy = sum_y2 - n * mean_y * mean_y
        if abs(ss_xx) < 1e-10:
            return max(ss_yy, 0.0)
        return max(ss_yy - (ss_xy * ss_xy) / ss_xx, 0.0)


class _MeanVarianceCost:
    """Joint mean+variance Gaussian NLL, n*(1 + log var)
    (cost.rs:155-180)."""

    def __init__(self, y: np.ndarray):
        self.c1 = np.concatenate(([0.0], np.cumsum(y)))
        self.c2 = np.concatenate(([0.0], np.cumsum(y * y)))

    def cost(self, s: int, e: int) -> float:
        n = e - s
        if n < 2:
            return 0.0
        s1 = self.c1[e] - self.c1[s]
        s2 = self.c2[e] - self.c2[s]
        var = (s2 - s1 * s1 / n) / n
        if var < 1e-10:
            return 0.0
        return n * (1.0 + math.log(var))


class _CusumCost:
    """Max absolute cumulative deviation from the segment mean
    (cost.rs:183-208). O(n_seg) per eval, vectorized. NOT subadditive —
    PELT pruning is disabled for this cost."""

    prunable = False

    def __init__(self, y: np.ndarray):
        self.y = y
        self.c1 = np.concatenate(([0.0], np.cumsum(y)))

    def cost(self, s: int, e: int) -> float:
        n = e - s
        if n < 2:
            return 0.0
        mean = (self.c1[e] - self.c1[s]) / n
        cum = np.cumsum(self.y[s:e] - mean)
        return float(np.abs(cum).max())


class _PeriodicityCost:
    """Unexplained-variance cost from the top-3 periodogram powers
    (cost.rs:211-258): total_var * (1 - strength*0.9); L2 fallback below
    8 points. Not subadditive — pruning disabled."""

    prunable = False

    def __init__(self, y: np.ndarray):
        self.y = y
        self.c1 = np.concatenate(([0.0], np.cumsum(y)))
        self.c2 = np.concatenate(([0.0], np.cumsum(y * y)))

    def _l2(self, s: int, e: int) -> float:
        n = e - s
        s1 = self.c1[e] - self.c1[s]
        s2 = self.c2[e] - self.c2[s]
        return s2 - s1 * s1 / n

    def cost(self, s: int, e: int) -> float:
        from .detection import periodogram

        n = e - s
        if n <= 0:
            return 0.0
        if n < 8:
            return max(self._l2(s, e), 0.0)
        total_var = max(self._l2(s, e), 0.0)
        if total_var < 1e-10:
            return 0.0
        _, powers = periodogram(self.y[s:e])
        if powers.size == 0:
            return total_var
        total_power = float(powers.sum())
        if total_power < 1e-10:
            return total_var
        k = min(3, powers.size)
        explained = float(np.sort(powers)[-k:].sum())
        strength = explained / total_power
        return total_var * (1.0 - strength * 0.9)


_COSTS = {
    "l2": _L2Cost,
    "normal": _NormalCost,
    "l1": _L1Cost,
    "poisson": _PoissonCost,
    "linear_trend": _LinearTrendCost,
    "mean_variance": _MeanVarianceCost,
    "cusum": _CusumCost,
    "periodicity": _PeriodicityCost,
}


def pelt_detect(
    y: np.ndarray,
    cost: str = "l2",
    penalty: float | None = None,
    min_segment_length: int = 2,
):
    """Returns sorted changepoint indices (segment start positions,
    exclusive of 0 and n)."""
    y = np.asarray(y, dtype=np.float64)
    n = y.size
    if n < 2 * min_segment_length:
        return []
    if penalty is None:
        penalty = (
            3.0 * math.log(n)
            if cost in ("normal", "mean_variance")
            else 2.0 * math.log(n)
        )
    c = _COSTS[cost](y)
    # cusum/periodicity costs are not subadditive: Killick's pruning
    # inequality does not hold, so fall back to the exhaustive candidate
    # set (O(n^2), exact)
    prunable = getattr(c, "prunable", True)

    f = np.full(n + 1, np.inf)
    f[0] = -penalty
    prev = np.zeros(n + 1, dtype=np.int64)
    candidates = [0]
    K = 0.0  # pruning constant (0 valid for these costs)
    for t in range(min_segment_length, n + 1):
        best_val, best_s = np.inf, 0
        for s in candidates:
            if t - s < min_segment_length:
                continue
            v = f[s] + c.cost(s, t) + penalty
            if v < best_val:
                best_val, best_s = v, s
        f[t] = best_val
        prev[t] = best_s
        # DELAYED pruning: Killick's dominance test at time t0 covers all
        # future T >= t0 + min_segment_length, so acting on it at step t
        # (affecting steps >= t+1) requires t0 = t - min_seg + 1 — pruning
        # against f[t] directly drops candidates that are still the only
        # FEASIBLE last-changepoint for the next min_seg-1 steps and can
        # return a suboptimal partition (caught by the O(n^2) DP oracle).
        t0 = t - min_segment_length + 1
        if prunable and t0 >= min_segment_length:
            candidates = [
                s
                for s in candidates
                if (t0 - s < min_segment_length)
                or (f[s] + c.cost(s, t0) + K <= f[t0])
            ]
        candidates.append(t - min_segment_length + 1)

    # backtrack
    cps = []
    t = n
    while t > 0:
        s = prev[t]
        if s > 0:
            cps.append(int(s))
        t = s
    return sorted(cps)
