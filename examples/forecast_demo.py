"""Fit every registered model on one series and print 6-step forecasts.

    PYTHONPATH=.. python examples/forecast_demo.py
"""
import numpy as np

from anofox_forecast_ray.models import REGISTRY, make_model

rng = np.random.default_rng(0)
t = np.arange(120)
y = 50 + 0.3 * t + 8 * np.sin(2 * np.pi * t / 12) + rng.normal(0, 1, 120)

for name in sorted(REGISTRY):
    try:
        kw = {"period": 12} if name in (
            "seasonal_naive", "holt_winters", "seasonal_es", "theta",
            "optimized_theta", "auto_theta", "dstm", "dotm",
        ) else {}
        m = make_model(name, **kw).fit(y)
        pred = np.asarray(m.predict(6))
        print(f"{name:24s} {np.array2string(pred, precision=2)}")
    except Exception as e:
        print(f"{name:24s} <{type(e).__name__}: {e}>")
