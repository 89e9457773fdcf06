"""Rolling / expanding-origin cross-validation.

Reference semantics: src/utils/cross_validation.rs:10-200 — fold loop:
slice training window -> fresh model from factory -> fit -> predict(h) ->
per-fold metrics; aggregate mean/std across folds. Strategies: expanding
(train start fixed at 0) or rolling (fixed-width window).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .metrics import calculate_metrics


@dataclass
class CVConfig:
    horizon: int = 1
    initial_train_size: int = 10
    step: int = 1
    strategy: str = "expanding"   # "expanding" | "rolling"
    window_size: int | None = None  # rolling window (defaults to initial)
    max_folds: int | None = None


def cross_validate(y: np.ndarray, model_factory, config: CVConfig | None = None):
    """Returns dict with per-fold metrics list + mean/std aggregates."""
    y = np.asarray(y, dtype=np.float64)
    cfg = config or CVConfig()
    n = y.size
    folds = []
    start = cfg.initial_train_size
    fold_no = 0
    while start + cfg.horizon <= n:
        if cfg.max_folds is not None and fold_no >= cfg.max_folds:
            break
        if cfg.strategy == "rolling":
            w = cfg.window_size or cfg.initial_train_size
            train = y[max(0, start - w) : start]
        else:
            train = y[:start]
        test = y[start : start + cfg.horizon]
        model = model_factory()
        try:
            model.fit(train)
            pred = np.asarray(model.predict(cfg.horizon), dtype=np.float64)
        except Exception:
            start += cfg.step
            continue
        m = calculate_metrics(test, pred, train=train)
        m["fold"] = fold_no
        m["train_end"] = int(start)
        folds.append(m)
        fold_no += 1
        start += cfg.step

    agg = {}
    for key in ("mae", "mse", "rmse", "mape", "smape"):
        vals = np.array([f[key] for f in folds if np.isfinite(f.get(key, np.nan))])
        if vals.size:
            agg[f"mean_{key}"] = float(vals.mean())
            agg[f"std_{key}"] = float(vals.std())
    return {"folds": folds, "aggregate": agg, "n_folds": len(folds)}
