"""Seventh query wave: forecast accuracy metrics, ACF features,
closed-form ADF, fixed-parameter GARCH(1,1), rolling median, token
quantiles, naive interval calibration (coverage + Winkler), and the
damped-trend ETS fold — each with an exact DuckDB oracle.

Bitwise notes (CLAUDE.md float-fold rule):
- numpy sums over < 8 elements are strict left folds, so the 4-term
  holdout metrics (MAE/MSE/MAPE/sMAPE/R^2) and the 6-term calibration
  means replay exactly via explicit left-associated SQL adds; every
  longer sum (MASE scale, ACF, ADF, GARCH seeds, interval variance) is a
  cumsum fold in the kernel and a list_reduce in SQL.
- median over an ODD window (5) is an order statistic — no
  interpolation, bitwise-safe on floats.
- token quantiles interpolate at g in {0, .25, .5, .75} between integer
  codepoints: (b-a)*g and a+(b-a)*g are exact, so numpy's lerp and
  DuckDB's quantile_cont agree bit-for-bit.
- pow(phi, h) for the damped sum hits the same libm on both sides.

Reference parity: src/utils/metrics.rs:7-203,
src/features/autocorrelation.rs:14-40, src/validation/stationarity.rs
(DF regression), src/models/garch.rs:340-420, src/transform/window.rs
(rolling_median), src/features/distribution.rs:56-84 (quantile),
tests/interval_calibration.rs:21-121, src/models/exponential/ets.rs
(damped trend recursion).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import (
    FORECAST_SCHEMA,
    SQL_TOK,
    _cast,
    _forecast_query,
    _series_list_sql,
    corpus_ds,
)
from .queries_wave5 import _doc_series_rows

_FOLD = "(acc, x) -> acc + x"


def _forecast_metrics_query(width: int, horizon: int = 4):
    """Holdout accuracy of the naive forecaster: train on all but the
    last ``horizon`` window means, score MAE/MSE/RMSE/MAPE/sMAPE/MASE/R^2
    on the holdout (kernels/metrics.py; src/utils/metrics.rs:7-203)."""

    def q(sf_dir: str):
        from ..kernels import metrics as M

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "mae": [], "mse": [], "rmse": [],
                   "mape": [], "smape": [], "mase": [], "r2": []}
            for doc, y in _doc_series_rows(t, width, min_points=8):
                train, test = y[:-horizon], y[-horizon:]
                pred = np.full(horizon, train[-1])
                # MASE scale over the train diffs: cumsum left fold (the
                # pairwise np.mean in metrics.mase covers > 8 terms)
                d = np.abs(train[1:] - train[:-1])
                scale = float(np.cumsum(d)[-1]) / d.size
                mae_v = M.mae(test, pred)
                out["doc_id"].append(doc)
                out["mae"].append(mae_v)
                out["mse"].append(M.mse(test, pred))
                out["rmse"].append(M.rmse(test, pred))
                out["mape"].append(M.mape(test, pred))
                out["smape"].append(M.smape(test, pred))
                out["mase"].append(mae_v / scale if scale != 0
                                   else float("nan"))
                out["r2"].append(M.r2(test, pred))
            return pa.table(
                {k: pa.array(v, type=pa.string() if k == "doc_id"
                             else pa.float64())
                 for k, v in out.items()}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "mae": pa.float64(),
             "mse": pa.float64(), "rmse": pa.float64(),
             "mape": pa.float64(), "smape": pa.float64(),
             "mase": pa.float64(), "r2": pa.float64()},
        )

    assert horizon == 4, "SQL below spelled out for horizon 4"
    h = horizon
    # test element j is ms[n-4+j], prediction is ms[n-4] (naive)
    a = [f"ms[CAST(n - {h} + {j} AS INTEGER)]" for j in range(1, h + 1)]
    p = f"ms[CAST(n - {h} AS INTEGER)]"
    mae_terms = " + ".join(f"abs({aj} - {p})" for aj in a)
    mse_terms = " + ".join(f"({aj} - {p}) * ({aj} - {p})" for aj in a)
    mape_terms = " + ".join(f"abs(({aj} - {p}) / {aj})" for aj in a)
    smape_terms = " + ".join(
        f"abs({aj} - {p}) / ((abs({aj}) + abs({p})) / 2.0e0)" for aj in a
    )
    am = "(" + " + ".join(a) + f") / {float(h)}e0"
    sst_terms = " + ".join(f"({aj} - am) * ({aj} - am)" for aj in a)
    sql = f"""
    {_series_list_sql(width, min_points=8)},
    st AS (
        SELECT doc_id, ms, n, {am} AS am,
               list_reduce(list_transform(
                   generate_series(2, CAST(n - {h} AS INTEGER)),
                   t -> abs(ms[t] - ms[t - 1])), {_FOLD})
               / CAST(n - {h + 1} AS DOUBLE) AS scale
        FROM l
    )
    SELECT doc_id,
           ({mae_terms}) / {float(h)}e0 AS mae,
           ({mse_terms}) / {float(h)}e0 AS mse,
           sqrt(({mse_terms}) / {float(h)}e0) AS rmse,
           ({mape_terms}) / {float(h)}e0 * 100.0e0 AS mape,
           ({smape_terms}) / {float(h)}e0 * 100.0e0 AS smape,
           CASE WHEN scale = 0 THEN 'nan'::DOUBLE
                ELSE ({mae_terms}) / {float(h)}e0 / scale END AS mase,
           CASE WHEN ({sst_terms}) = 0 THEN 'nan'::DOUBLE
                ELSE 1.0e0 - ({mse_terms}) / ({sst_terms}) END AS r2
    FROM st
    """
    return q, sql


def _acf_query(width: int, nlags: int = 4):
    """ACF at lags 1..4 of the w{width} mean series per doc
    (kernels/features.acf — sequential folds; autocorrelation.rs:14-40)."""

    def q(sf_dir: str):
        from ..kernels.features import acf

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": []}
            for k in range(1, nlags + 1):
                out[f"acf{k}"] = []
            for doc, y in _doc_series_rows(t, width):
                r = acf(y, nlags)
                out["doc_id"].append(doc)
                for k in range(1, nlags + 1):
                    out[f"acf{k}"].append(float(r[k]))
            return pa.table(
                {k: pa.array(v, type=pa.string() if k == "doc_id"
                             else pa.float64())
                 for k, v in out.items()}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(),
             **{f"acf{k}": pa.float64() for k in range(1, nlags + 1)}},
        )

    lag_cols = ",\n           ".join(
        f"""CASE WHEN {k} < n AND var >= 1e-10 THEN
               list_reduce(list_transform(
                   generate_series(1, CAST(n - {k} AS INTEGER)),
                   i -> (ms[i] - m) * (ms[i + {k}] - m)), {_FOLD})
               / (n * var)
           ELSE 0.0e0 END AS acf{k}"""
        for k in range(1, nlags + 1)
    )
    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               list_reduce(ms, {_FOLD}) / n AS m
        FROM l
    ),
    v AS (
        SELECT doc_id, ms, n, m,
               list_reduce(list_transform(ms, x -> (x - m) * (x - m)),
                           {_FOLD}) / n AS var
        FROM st
    )
    SELECT doc_id,
           {lag_cols}
    FROM v
    """
    return q, sql


def _adf_query(width: int):
    """Closed-form Dickey-Fuller t-stat (lag 0, constant) per doc —
    kernels/features.adf_stat_lag0, Cramer fold sums on both sides."""

    def q(sf_dir: str):
        from ..kernels.features import adf_stat_lag0

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "adf_t": []}
            for doc, y in _doc_series_rows(t, width, min_points=10):
                out["doc_id"].append(doc)
                out["adf_t"].append(adf_stat_lag0(y))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "adf_t": pa.array(out["adf_t"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "adf_t": pa.float64()},
        )

    sql = f"""
    {_series_list_sql(width, min_points=10)},
    s AS (
        SELECT doc_id, ms, CAST(n - 1 AS DOUBLE) AS m,
            list_reduce(list_transform(generate_series(2, CAST(n AS INTEGER)),
                t -> ms[t - 1]), {_FOLD}) AS sx,
            list_reduce(list_transform(generate_series(2, CAST(n AS INTEGER)),
                t -> ms[t - 1] * ms[t - 1]), {_FOLD}) AS sxx,
            list_reduce(list_transform(generate_series(2, CAST(n AS INTEGER)),
                t -> ms[t] - ms[t - 1]), {_FOLD}) AS sy,
            list_reduce(list_transform(generate_series(2, CAST(n AS INTEGER)),
                t -> ms[t - 1] * (ms[t] - ms[t - 1])), {_FOLD}) AS sxy,
            n
        FROM l
    ),
    fit AS (
        SELECT doc_id, ms, m, n, m * sxx - sx * sx AS det,
               (m * sxy - sx * sy) / (m * sxx - sx * sx) AS rho, sx, sy
        FROM s
    ),
    res AS (
        SELECT doc_id, m, det, rho,
            list_reduce(list_transform(generate_series(2, CAST(n AS INTEGER)),
                t -> (ms[t] - ms[t - 1] - (sy - rho * sx) / m
                      - rho * ms[t - 1])
                     * (ms[t] - ms[t - 1] - (sy - rho * sx) / m
                        - rho * ms[t - 1])), {_FOLD}) AS sse
        FROM fit
    )
    SELECT doc_id,
           CASE WHEN det = 0 OR sse / (m - 2.0e0) * m / det <= 0
                THEN 'nan'::DOUBLE
                ELSE rho / sqrt(sse / (m - 2.0e0) * m / det) END AS adf_t
    FROM res
    """
    return q, sql


def _garch_query(width: int, alpha: float = 0.1, beta: float = 0.8,
                 horizon: int = 4):
    """Fixed-parameter GARCH(1,1) conditional-variance forecast
    (kernels/garch.garch_fit_fixed + garch_forecast_variance;
    src/models/garch.rs:340-420). omega = 0.1 * var seed."""

    def q(sf_dir: str):
        from ..kernels.garch import garch_fit_fixed, garch_forecast_variance

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "h": [], "sigma2": [], "mu": []}
            for doc, y in _doc_series_rows(t, width, min_points=10):
                st = garch_fit_fixed(y, alpha=alpha, beta=beta)
                f = garch_forecast_variance(st, horizon)
                for h in range(1, horizon + 1):
                    out["doc_id"].append(doc)
                    out["h"].append(h)
                    out["sigma2"].append(float(f[h - 1]))
                    out["mu"].append(st.mean)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "h": pa.array(out["h"], type=pa.int32()),
                    "sigma2": pa.array(out["sigma2"], type=pa.float64()),
                    "mu": pa.array(out["mu"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "h": pa.int32(),
             "sigma2": pa.float64(), "mu": pa.float64()},
        )

    a, b = alpha, beta
    # forward recursion spelled out per h (same rounding order as the
    # kernel's sequential loop)
    f = ["f1"]
    for _ in range(2, horizon + 1):
        f.append(f"w + ({a}e0 + {b}e0) * ({f[-1]})")
    h_cases = " ".join(
        f"WHEN hh.h = {i + 1} THEN {expr}" for i, expr in enumerate(f)
    )
    sql = f"""
    {_series_list_sql(width, min_points=10)},
    st AS (
        SELECT doc_id, ms, n,
               list_reduce(ms, {_FOLD}) / n AS mu
        FROM l
    ),
    e AS (
        SELECT doc_id, n, mu,
               list_transform(ms, x -> (x - mu) * (x - mu)) AS e2
        FROM st
    ),
    seed AS (
        SELECT doc_id, n, mu, e2,
               list_reduce(e2, {_FOLD}) / n AS var
        FROM e
    ),
    path AS (
        SELECT doc_id, n, mu, e2, 0.1e0 * var AS w,
               list_reduce(
                   list_prepend(var, e2[1:CAST(n - 1 AS INTEGER)]),
                   (acc, x) -> 0.1e0 * var + {a}e0 * x + {b}e0 * acc
               ) AS s2_last
        FROM seed
    ),
    f1t AS (
        SELECT doc_id, mu, w,
               w + {a}e0 * e2[CAST(n AS INTEGER)] + {b}e0 * s2_last AS f1
        FROM path
    )
    SELECT doc_id, CAST(hh.h AS INTEGER) AS h,
           CASE {h_cases} END AS sigma2,
           mu
    FROM f1t CROSS JOIN
         (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    """
    return q, sql


def _rolling_median_query(width: int, window: int = 5):
    """Trailing rolling median (warm-up dropped) of the w{width} mean
    series — ODD window, so the median is an order statistic with no
    interpolation (kernels/windows.rolling_median; window.rs)."""
    assert window % 2 == 1, "odd window keeps the median interpolation-free"

    def q(sf_dir: str):
        from ..kernels.windows import rolling_median

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "window_id": [], "roll_med": []}
            for doc, y in _doc_series_rows(t, width):
                rm = rolling_median(y, window)
                ok = np.isfinite(rm)
                idx = np.flatnonzero(ok)
                out["doc_id"].extend([doc] * idx.size)
                out["window_id"].extend(idx.tolist())
                out["roll_med"].extend(rm[idx].tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"],
                                          type=pa.int64()),
                    "roll_med": pa.array(out["roll_med"],
                                         type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "roll_med": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY doc_id, wid
    ),
    nper AS (SELECT doc_id, count(*) AS n FROM w GROUP BY doc_id)
    SELECT w.doc_id, w.wid AS window_id,
           median(m) OVER win AS roll_med
    FROM w JOIN nper ON nper.doc_id = w.doc_id
    WHERE nper.n >= 4
    WINDOW win AS (PARTITION BY w.doc_id ORDER BY w.wid
                   ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
    QUALIFY row_number() OVER (PARTITION BY w.doc_id ORDER BY w.wid)
            >= {window}
    """
    return q, sql


def _token_quantiles_query():
    """q25/q50/q75 of the raw token codepoints per doc
    (kernels/features.quantile; distribution.rs:56-84). Interpolation
    fractions are quarters between integers — exact on both sides."""

    def q(sf_dir: str):
        from ..kernels.features import quantile
        from ..stages.rollup import _flat_tokens

        def tx(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            ids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "q25": [], "q50": [], "q75": []}
            stop = np.cumsum(lengths)
            start = stop - lengths
            for i, doc in enumerate(ids):
                arr = values[start[i]:stop[i]].astype(np.float64)
                if arr.size == 0:
                    continue
                out["doc_id"].append(doc)
                out["q25"].append(quantile(arr, 0.25))
                out["q50"].append(quantile(arr, 0.50))
                out["q75"].append(quantile(arr, 0.75))
            return pa.table(
                {k: pa.array(v, type=pa.string() if k == "doc_id"
                             else pa.float64())
                 for k, v in out.items()}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "q25": pa.float64(),
             "q50": pa.float64(), "q75": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT doc_id,
           quantile_cont(CAST(token AS DOUBLE), 0.25) AS q25,
           quantile_cont(CAST(token AS DOUBLE), 0.50) AS q50,
           quantile_cont(CAST(token AS DOUBLE), 0.75) AS q75
    FROM tok GROUP BY doc_id
    """
    return q, sql


def _interval_calibration_query(width: int, horizon: int = 2,
                                n_origins: int = 3, level: float = 0.95):
    """Rolling-origin interval calibration of the naive forecaster:
    per-doc empirical coverage + mean Winkler score
    (kernels/metrics.rolling_interval_evaluation; the reference's
    tests/interval_calibration.rs:21-121 as a first-class pipeline).

    n_origins * horizon = 6 < 8 keeps the final numpy means sequential;
    the per-origin naive variance is the cumsum fold in
    kernels/stats.residual_variance."""
    from ..kernels.stats import quantile_normal

    z = quantile_normal((1.0 + level) / 2.0)
    alpha = 1.0 - level

    def q(sf_dir: str):
        from ..kernels.metrics import rolling_interval_evaluation
        from ..models import make_model

        def tx(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "coverage": [], "winkler": []}
            for doc, y in _doc_series_rows(t, width):
                cov, wink = rolling_interval_evaluation(
                    lambda: make_model("naive"), y, horizon, level,
                    n_origins,
                )
                out["doc_id"].append(doc)
                out["coverage"].append(cov)
                out["winkler"].append(wink)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "coverage": pa.array(out["coverage"],
                                         type=pa.float64()),
                    "winkler": pa.array(out["winkler"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(tx, batch_format="pyarrow"),
            {"doc_id": pa.string(), "coverage": pa.float64(),
             "winkler": pa.float64()},
        )

    no, h = n_origins, horizon
    pen = f"(2.0e0 / {alpha!r}e0)"
    nterms = float(no * h)
    sql = f"""
    {_series_list_sql(width)},
    org AS (
        SELECT doc_id, ms, n, n // 2 + CAST(oo.o AS BIGINT) AS s
        FROM l CROSS JOIN
             (SELECT unnest(generate_series(0, {no - 1})) AS o) oo
        WHERE n >= n // 2 + {h + no}
    ),
    vo AS (
        SELECT doc_id, ms, n, s, ms[CAST(s AS INTEGER)] AS p,
               sqrt(list_reduce(list_transform(
                       generate_series(2, CAST(s AS INTEGER)),
                       t -> (ms[t] - ms[t - 1]) * (ms[t] - ms[t - 1])),
                       {_FOLD}) / (s - 1)) AS sd
        FROM org
    ),
    terms AS (
        SELECT doc_id, s, hh.h AS h,
               ms[CAST(s + hh.h AS INTEGER)] AS a,
               p - {z!r}e0 * (sd * sqrt(CAST(hh.h AS DOUBLE))) AS lo,
               p + {z!r}e0 * (sd * sqrt(CAST(hh.h AS DOUBLE))) AS up
        FROM vo CROSS JOIN
             (SELECT unnest(generate_series(1, {h})) AS h) hh
    ),
    folded AS (
        SELECT doc_id,
               list_reduce(list(
                   CASE WHEN a >= lo AND a <= up THEN 1.0e0
                        ELSE 0.0e0 END ORDER BY s, h), {_FOLD})
               / {nterms}e0 AS coverage,
               list_reduce(list(
                   (up - lo) + CASE WHEN a < lo THEN {pen} * (lo - a)
                                    WHEN a > up THEN {pen} * (a - up)
                                    ELSE 0.0e0 END ORDER BY s, h),
                   {_FOLD}) / {nterms}e0 AS winkler
        FROM terms GROUP BY doc_id
    )
    SELECT l.doc_id,
           COALESCE(f.coverage, 0.0e0) AS coverage,
           COALESCE(f.winkler, 'infinity'::DOUBLE) AS winkler
    FROM l LEFT JOIN folded f ON f.doc_id = l.doc_id
    """
    return q, sql


def _forecast_ets_damped_query(width: int, alpha: float = 0.3,
                               beta: float = 0.1, phi: float = 0.9,
                               period: int = 12, horizon: int = 3):
    """ETS(A,Ad,N) with FIXED params: the damped Holt recursion as a
    2-list accumulator fold (kernels/smoothing._ets_update, damped arm;
    ets.rs damped trend). Forecast h uses the damped sum
    phi*(1-phi^h)/(1-phi) — pow() hits the same libm on both sides."""
    q = _forecast_query(
        width, "ets",
        {"spec": "AAdN", "optimize": False, "alpha": alpha, "beta": beta,
         "phi": phi, "period": period},
        horizon,
    )
    a, b, ph = alpha, beta, phi
    maxn = f"LEAST(n, {max(10, 2 * period)})"
    lvl = f"{a}e0 * e[1] + (1.0e0 - {a}e0) * (acc[1] + {ph}e0 * acc[2])"
    dsum = (f"({ph}e0 * (1.0e0 - pow({ph}e0, CAST(hh.h AS DOUBLE)))"
            f" / (1.0e0 - {ph}e0))")
    sql = f"""
    {_series_list_sql(width)},
    init AS (
        SELECT doc_id, ms, n, {maxn} AS mn,
               ({maxn} + 1) / 2.0e0 AS xm,
               list_reduce(ms[1:{maxn}], {_FOLD}) / {maxn} AS ym
        FROM l
    ),
    ols AS (
        SELECT doc_id, ms, ym, xm,
               list_reduce(list_transform(generate_series(1, mn),
                   i -> (CAST(i AS DOUBLE) - xm) * (ms[i] - ym)),
                   {_FOLD}) AS ss_xy,
               list_reduce(list_transform(generate_series(1, mn),
                   i -> (CAST(i AS DOUBLE) - xm) * (CAST(i AS DOUBLE) - xm)),
                   {_FOLD}) AS ss_xx
        FROM init
    ),
    state AS (
        -- 2-list [level, trend] accumulator (struct accumulators hit the
        -- DuckDB stale-acc lambda bug; see the AAN oracle)
        SELECT doc_id,
               list_reduce(
                   list_prepend(
                       [ym - (CASE WHEN ss_xx > 0 THEN ss_xy / ss_xx
                                   ELSE 0.0e0 END) * xm,
                        CASE WHEN ss_xx > 0 THEN ss_xy / ss_xx
                             ELSE 0.0e0 END],
                       list_transform(ms, v -> [v, 0.0e0])),
                   (acc, e) -> [
                       {lvl},
                       {b}e0 * (({lvl}) - acc[1])
                       + (1.0e0 - {b}e0) * {ph}e0 * acc[2]]
               ) AS fin
        FROM ols
    )
    SELECT doc_id, 'ets' AS model, CAST(hh.h AS INTEGER) AS h,
           fin[1] + {dsum} * fin[2] AS yhat
    FROM state CROSS JOIN
         (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    """
    return q, sql


def build_wave7_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("forecast_metrics_w8",) + _forecast_metrics_query(8)))
    add(*(("doc_acf_w8",) + _acf_query(8)))
    add(*(("doc_adf_lag0",) + _adf_query(8)))
    add(*(("forecast_garch_w8",) + _garch_query(8)))
    add(*(("doc_rolling_median_w8",) + _rolling_median_query(8)))
    add(*(("doc_token_quantiles",) + _token_quantiles_query()))
    add(*(("interval_naive_cov_w8",) + _interval_calibration_query(8)))
    add(*(("forecast_ets_damped_w8",) + _forecast_ets_damped_query(8)))
    return queries, oracles
