"""Bootstrap prediction intervals.

Reference semantics: src/utils/bootstrap.rs:15-260 — residual bootstrap
(resample fitted residuals with a seeded RNG, add to point forecasts,
take percentiles) and moving-block bootstrap. Determinism: seeded
``np.random.Generator(PCG64(seed))``; inside actor stages the seed is
``seed ^ hash(doc_id)`` so retries are bitwise-stable (SURVEY.md §4.1).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class BootstrapConfig:
    n_iterations: int = 1000
    level: float = 0.95
    seed: int = 42
    method: str = "residual"   # "residual" | "block"
    block_size: int | None = None


def bootstrap_intervals(
    point: np.ndarray, residuals: np.ndarray, config: BootstrapConfig | None = None
):
    """Returns (lower, upper) arrays of len(point)."""
    cfg = config or BootstrapConfig()
    point = np.asarray(point, dtype=np.float64)
    res = np.asarray(residuals, dtype=np.float64)
    res = res[np.isfinite(res)]
    h = point.size
    if res.size == 0 or h == 0:
        nan = np.full(h, np.nan)
        return nan, nan
    rng = np.random.Generator(np.random.PCG64(cfg.seed))
    if cfg.method == "block":
        b = cfg.block_size or max(1, int(np.sqrt(res.size)))
        n_blocks = -(-h // b)
        sims = np.empty((cfg.n_iterations, h))
        for i in range(cfg.n_iterations):
            starts = rng.integers(0, max(1, res.size - b + 1), n_blocks)
            draw = np.concatenate([res[s : s + b] for s in starts])[:h]
            sims[i] = point + draw
    else:
        idx = rng.integers(0, res.size, size=(cfg.n_iterations, h))
        sims = point[None, :] + res[idx]
    alpha = (1.0 - cfg.level) / 2.0
    lower = np.quantile(sims, alpha, axis=0)
    upper = np.quantile(sims, 1.0 - alpha, axis=0)
    return lower, upper


def bootstrap_forecast(model, y: np.ndarray, horizon: int,
                       config: BootstrapConfig | None = None):
    """fit -> point forecast -> residual-bootstrap intervals."""
    model.fit(np.asarray(y, dtype=np.float64))
    point = np.asarray(model.predict(horizon), dtype=np.float64)
    res = model.residuals()
    lower, upper = bootstrap_intervals(
        point, res if res is not None else np.zeros(0), config
    )
    return point, lower, upper
