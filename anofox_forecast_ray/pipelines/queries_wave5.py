"""Fifth query wave: the remaining fold-expressible exponential-smoothing
family (standalone Holt, additive Holt-Winters, TSB, SeasonalES) and the
residual/stationarity diagnostics (Durbin-Watson, Ljung-Box, KPSS) — each
with an exact DuckDB oracle.

Discipline (CLAUDE.md): every float accumulation the kernel performs is a
SEQUENTIAL left fold (cumsum / scalar loop), replayed in SQL with
list_reduce; smoothing-constant complements are spelled ``(1.0e0 - a)`` so
both sides round identically; NaN rows (models that refuse short series)
are emitted by BOTH sides so the hash covers the failure surface too.

Reference parity targets:
- Holt          src/models/exponential/holt.rs:23-360 (fixed alpha/beta)
- Holt-Winters  src/models/exponential/holt_winters.rs:36-400 (= ETS AAA)
- TSB           src/models/intermittent/tsb.rs:18-160
- SeasonalES    src/models/exponential/seasonal_es.rs:51-300
- diagnostics   src/validation/residual_tests.rs:37-175,
                src/validation/stationarity.rs:285-380
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


def _forecast_holt_query(width: int, alpha: float = 0.3, beta: float = 0.1,
                         horizon: int = 2):
    """Standalone Holt with FIXED (alpha, beta): l0 = y0, b0 = y1 - y0,
    then the damped-free recursion over y[1:]; yhat(h) = level + h*trend.
    The level update is inlined twice in the SQL fold (trend needs the
    new level) — lists fold correctly where struct accumulators don't."""
    q = _forecast_query(width, "holt", {"alpha": alpha, "beta": beta},
                        horizon)
    a, b = f"{alpha}e0", f"{beta}e0"
    lupd = f"{a} * x[1] + (1.0e0 - {a}) * (acc[1] + acc[2])"
    sql = f"""
    {_series_list_sql(width)},
    state AS (
        SELECT doc_id, n, list_reduce(
            list_prepend([ms[1], ms[2] - ms[1]],
                         list_transform(ms[2:CAST(n AS INTEGER)],
                                        v -> [v, 0.0e0])),
            (acc, x) -> [{lupd},
                         {b} * (({lupd}) - acc[1])
                         + (1.0e0 - {b}) * acc[2]]) AS fin
        FROM l
    )
    SELECT doc_id, 'holt' AS model, CAST(hh.h AS INTEGER) AS h,
           fin[1] + CAST(hh.h AS DOUBLE) * fin[2] AS yhat
    FROM state CROSS JOIN
         (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    """
    return q, sql


def _forecast_hw_query(width: int, period: int = 4, alpha: float = 0.3,
                       beta: float = 0.1, gamma: float = 0.1,
                       horizon: int = 4):
    """Additive Holt-Winters (= ETS(A,A,A)) with fixed smoothing params.

    Init (kernels/smoothing._ets_initial_state, seasonal branch):
    level = mean(y[:p]), trend = mean((y[p:2p] - y[:p]) / p),
    seasonals = y[:p] - level. State folds as an (2+p)-list
    [level, trend, s_0..s_{p-1}]; the updated slot is spliced back with
    list slices. Docs with n < 2p emit NaN rows on BOTH sides (the
    engine's per-row error surfacing)."""
    q = _forecast_query(
        width, "holt_winters",
        {"period": period, "seasonal": "add", "optimize": False,
         "alpha": alpha, "beta": beta, "gamma": gamma},
        horizon,
    )
    p = period
    a, b, g = f"{alpha}e0", f"{beta}e0", f"{gamma}e0"
    # sequential left-assoc sums over the first p / next p elements
    lv = " + ".join(f"ms[{j + 1}]" for j in range(p))
    lv = f"({lv}) / {float(p)}e0"
    tr = " + ".join(f"(ms[{p + j + 1}] - ms[{j + 1}]) / {float(p)}e0"
                    for j in range(p))
    tr = f"({tr}) / {float(p)}e0"
    seas = ", ".join(f"ms[{j + 1}] - lv" for j in range(p))
    sidx = "CAST(e[2] AS INTEGER)"
    lupd = f"{a} * (e[1] - acc[{sidx} + 3]) + (1.0e0 - {a}) * (acc[1] + acc[2])"
    sql = f"""
    {_series_list_sql(width)},
    init AS (
        SELECT doc_id, ms, n, {lv} AS lv FROM l WHERE n >= {2 * p}
    ),
    state AS (
        SELECT doc_id, n,
            list_reduce(
                list_prepend(
                    [lv, {tr}, {seas}],
                    list_transform(
                        generate_series({p + 1}, CAST(n AS INTEGER)),
                        i -> [ms[i], CAST((i - 1) % {p} AS DOUBLE)])),
                (acc, e) -> list_concat(
                    list_concat(
                        list_concat(
                            [{lupd},
                             {b} * (({lupd}) - acc[1])
                             + (1.0e0 - {b}) * acc[2]],
                            acc[3 : {sidx} + 2]),
                        [{g} * (e[1] - ({lupd}))
                         + (1.0e0 - {g}) * acc[{sidx} + 3]]),
                    acc[{sidx} + 4 : {p + 2}])
            ) AS fin
        FROM init
    )
    SELECT l.doc_id, 'holt_winters' AS model, CAST(hh.h AS INTEGER) AS h,
           CASE WHEN state.doc_id IS NULL THEN 'nan'::DOUBLE
                ELSE fin[1] + CAST(hh.h AS DOUBLE) * fin[2]
                     + fin[CAST((l.n + hh.h - 1) % {p} AS INTEGER) + 3]
           END AS yhat
    FROM l LEFT JOIN state ON state.doc_id = l.doc_id
    CROSS JOIN (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    """
    return q, sql


def _forecast_tsb_query(width: int, modulus: int = 25, alpha: float = 0.1):
    """TSB over the same intermittent demand grid as the Croston query
    (demand(w) = count of tokens with token % modulus == 0, dense zeros):
    yhat = ses(occurrence 0/1 indicator) * ses(demand sizes), both fixed
    alpha. Needs >= 4 windows and >= 1 demand (tsb.rs guards)."""

    def q(sf_dir: str):
        from ..kernels.rollup import rollup_flat_masked
        from ..models import make_model
        from ..stages.rollup import _flat_tokens

        def fc(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            mask = values % modulus == 0
            r = rollup_flat_masked(values, lengths, width, mask)
            ids = t.column("doc_id").to_pylist()
            out_doc, out_yhat = [], []
            ridx = r["row_idx"]
            if ridx.size:
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                m = make_model("tsb", alpha_d=alpha, alpha_p=alpha)
                for s0, s1 in zip(bounds, ends):
                    y = r["cnt"][s0:s1].astype(np.float64)
                    if y.size < 4 or not (y > 0).any():
                        continue
                    m.fit(y)
                    out_doc.append(ids[ridx[s0]])
                    out_yhat.append(float(m.predict(1)[0]))
            return pa.table(
                {
                    "doc_id": pa.array(out_doc, type=pa.string()),
                    "model": pa.array(["tsb"] * len(out_doc)),
                    "h": pa.array([1] * len(out_doc), type=pa.int32()),
                    "yhat": pa.array(out_yhat, type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(fc, batch_format="pyarrow"),
            FORECAST_SCHEMA,
        )

    a = f"{alpha}e0"
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    nwin AS (
        SELECT doc_id, (max(pos) // {width}) AS max_w FROM tok
        GROUP BY doc_id
    ),
    dem AS (
        SELECT doc_id, pos // {width} AS w,
               CAST(count(*) AS DOUBLE) AS d
        FROM tok WHERE token % {modulus} = 0 GROUP BY doc_id, w
    ),
    grid AS (
        SELECT n.doc_id, g.w, COALESCE(dem.d, 0.0e0) AS d
        FROM nwin n
        CROSS JOIN LATERAL (
            SELECT unnest(generate_series(0, n.max_w)) AS w
        ) g
        LEFT JOIN dem ON dem.doc_id = n.doc_id AND dem.w = g.w
    ),
    lists AS (
        SELECT doc_id,
               list(d ORDER BY w) FILTER (WHERE d > 0) AS demands,
               list(CAST(d > 0.0e0 AS DOUBLE) ORDER BY w) AS ind
        FROM grid GROUP BY doc_id
        HAVING count(*) >= 4 AND count(*) FILTER (WHERE d > 0) >= 1
    )
    SELECT doc_id, 'tsb' AS model, CAST(1 AS INTEGER) AS h,
           list_reduce(ind, (acc, x) -> {a} * x + (1.0e0 - {a}) * acc)
           * list_reduce(demands, (acc, x) -> {a} * x + (1.0e0 - {a}) * acc)
             AS yhat
    FROM lists
    """
    return q, sql


def _forecast_seasonal_es_query(width: int, period: int = 4,
                                alpha: float = 0.1, horizon: int = 4):
    """SeasonalES: an independent fixed-alpha SES level per seasonal slot
    (wid % period); yhat(h) = level[(n + h - 1) % period]."""
    q = _forecast_query(width, "seasonal_es",
                        {"period": period, "alpha": alpha}, horizon)
    a = f"{alpha}e0"
    sql = f"""
    {_series_list_sql(width)},
    slots AS (
        SELECT doc_id, wid % {period} AS slot, list(m ORDER BY wid) AS sms
        FROM w GROUP BY doc_id, slot
    ),
    lv AS (
        SELECT doc_id, slot,
               list_reduce(sms,
                   (acc, x) -> {a} * x + (1.0e0 - {a}) * acc) AS lev
        FROM slots
    )
    SELECT l.doc_id, 'seasonal_es' AS model, CAST(hh.h AS INTEGER) AS h,
           lv.lev AS yhat
    FROM l CROSS JOIN
         (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    JOIN lv ON lv.doc_id = l.doc_id
           AND lv.slot = (l.n + hh.h - 1) % {period}
    """
    return q, sql


def _doc_series_rows(t: pa.Table, width: int, min_points: int = 4):
    """Yield (doc_id, window-mean series) per doc in a corpus batch."""
    from ..kernels.rollup import rollup_flat
    from ..stages.rollup import _flat_tokens

    values, lengths = _flat_tokens(t)
    r = rollup_flat(values, lengths, width)
    means = r["sum"].astype(np.float64) / r["cnt"]
    ridx = r["row_idx"]
    ids = t.column("doc_id").to_pylist()
    if not ridx.size:
        return
    bounds = np.flatnonzero(np.concatenate(([True], ridx[1:] != ridx[:-1])))
    ends = np.concatenate((bounds[1:], [ridx.size]))
    for s0, s1 in zip(bounds, ends):
        y = means[s0:s1]
        if y.size >= min_points:
            yield ids[ridx[s0]], y


def _durbin_watson_query(width: int):
    """Durbin-Watson over the mean-centered w{width} series per doc. The
    kernel's sums are cumsum left folds (kernels/validation.py), so the
    list_reduce replay is bitwise. Centering happens in the query with the
    same sequential mean."""

    def q(sf_dir: str):
        from ..kernels.validation import durbin_watson

        def stats(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "n": [], "dw": []}
            for doc, y in _doc_series_rows(t, width):
                m = float(np.cumsum(y)[-1]) / y.size
                out["doc_id"].append(doc)
                out["n"].append(y.size)
                out["dw"].append(durbin_watson(y - m))
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "n": pa.array(out["n"], type=pa.int64()),
                    "dw": pa.array(out["dw"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(stats, batch_format="pyarrow"),
            {"doc_id": pa.string(), "n": pa.int64(), "dw": pa.float64()},
        )

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               list_reduce(ms, (acc, x) -> acc + x) / n AS m
        FROM l
    ),
    s2 AS (
        SELECT doc_id, n,
            list_reduce(list_transform(generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m) * (ms[i] - m)), (acc, x) -> acc + x)
              AS denom,
            list_reduce(
                list_transform(generate_series(1, CAST(n AS INTEGER) - 1),
                    i -> ((ms[i + 1] - m) - (ms[i] - m))
                         * ((ms[i + 1] - m) - (ms[i] - m))),
                (acc, x) -> acc + x) AS num
        FROM st
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n,
           CASE WHEN denom = 0 THEN 'nan'::DOUBLE ELSE num / denom END AS dw
    FROM s2
    """
    return q, sql


def _ljung_box_query(width: int):
    """Ljung-Box Q over the w{width} series (acf centers internally):
    Q = n(n+2) * sum_k rho_k^2/(n-k), lags = min(max(min(10, n//5), 1),
    n-1). The p-value needs the iterative incomplete-gamma — deliberately
    NOT part of the query output so the oracle stays closed-form; the
    statistic/df columns are the full sufficient result."""

    def q(sf_dir: str):
        from ..kernels.validation import ljung_box

        def stats(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "statistic": [], "lags": [], "df": []}
            for doc, y in _doc_series_rows(t, width):
                r = ljung_box(y)
                out["doc_id"].append(doc)
                out["statistic"].append(r["statistic"])
                out["lags"].append(r["lags"])
                out["df"].append(r["df"])
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "statistic": pa.array(out["statistic"],
                                          type=pa.float64()),
                    "lags": pa.array(out["lags"], type=pa.int64()),
                    "df": pa.array(out["df"], type=pa.int64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(stats, batch_format="pyarrow"),
            {"doc_id": pa.string(), "statistic": pa.float64(),
             "lags": pa.int64(), "df": pa.int64()},
        )

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               LEAST(GREATEST(LEAST(10, n // 5), 1), n - 1) AS lags,
               list_reduce(ms, (acc, x) -> acc + x) / n AS m
        FROM l
    ),
    vr AS (
        SELECT doc_id, ms, n, lags, m,
            list_reduce(list_transform(generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m) * (ms[i] - m)), (acc, x) -> acc + x) / n
              AS var
        FROM st
    ),
    ks AS (
        SELECT doc_id, ms, n, lags, m, var, CAST(kk.k AS BIGINT) AS k
        FROM vr CROSS JOIN LATERAL (
            SELECT unnest(generate_series(1, CAST(lags AS INTEGER))) AS k) kk
    ),
    rk AS (
        SELECT doc_id, n, lags, k,
            CASE WHEN var >= 1e-10 THEN
                list_reduce(
                    list_transform(generate_series(1, CAST(n - k AS INTEGER)),
                        i -> (ms[i] - m) * (ms[i + k] - m)),
                    (acc, x) -> acc + x) / (n * var)
            ELSE 0.0e0 END AS rho
        FROM ks
    ),
    qq AS (
        SELECT doc_id, n, lags,
               list(rho * rho / (n - k) ORDER BY k) AS terms
        FROM rk GROUP BY doc_id, n, lags
    )
    SELECT doc_id,
           (n * (n + 2)) * list_reduce(terms, (acc, x) -> acc + x)
             AS statistic,
           CAST(lags AS BIGINT) AS lags,
           CAST(GREATEST(lags, 1) AS BIGINT) AS df
    FROM qq
    """
    return q, sql


def _kpss_query(width: int):
    """KPSS level-stationarity eta + the reference piecewise-linear p-value
    (stationarity.rs:366-381) per doc (n >= 10):
    eta = sum_t S_t^2 / (n^2 * lrv) with Bartlett long-run variance. Every
    sum (mean, lrv terms, S_t prefixes, eta numerator) is a sequential
    fold on both sides; S_t is recomputed per t as an O(n^2) inner fold —
    n <= ~100 windows/doc keeps that trivial."""

    def q(sf_dir: str):
        from ..kernels.validation import kpss_test

        def stats(t: pa.Table) -> pa.Table:
            out = {"doc_id": [], "statistic": [], "p_value": [], "lags": []}
            for doc, y in _doc_series_rows(t, width, min_points=10):
                r = kpss_test(y)
                out["doc_id"].append(doc)
                out["statistic"].append(r["statistic"])
                out["p_value"].append(r["p_value"])
                out["lags"].append(r["lags"])
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "statistic": pa.array(out["statistic"],
                                          type=pa.float64()),
                    "p_value": pa.array(out["p_value"], type=pa.float64()),
                    "lags": pa.array(out["lags"], type=pa.int64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(stats, batch_format="pyarrow"),
            {"doc_id": pa.string(), "statistic": pa.float64(),
             "p_value": pa.float64(), "lags": pa.int64()},
        )

    sql = f"""
    {_series_list_sql(width)},
    st AS (
        SELECT doc_id, ms, n,
               CAST(trunc(4.0e0 * pow(n / 100.0e0, 0.25e0)) AS BIGINT)
                 AS lags,
               list_reduce(ms, (acc, x) -> acc + x) / n AS m
        FROM l WHERE n >= 10
    ),
    base AS (
        SELECT doc_id, ms, n, lags, m,
            list_reduce(list_transform(generate_series(1, CAST(n AS INTEGER)),
                i -> (ms[i] - m) * (ms[i] - m)), (acc, x) -> acc + x) / n
              AS lrv0
        FROM st
    ),
    ks AS (
        SELECT doc_id, ms, n, lags, m, CAST(kk.k AS BIGINT) AS k
        FROM base CROSS JOIN LATERAL (
            SELECT unnest(generate_series(1, CAST(lags AS INTEGER))) AS k) kk
        WHERE lags >= 1
    ),
    tk AS (
        SELECT doc_id, k,
            2.0e0 * (1.0e0 - k / (lags + 1.0e0))
              * list_reduce(
                    list_transform(generate_series(1, CAST(n - k AS INTEGER)),
                        i -> (ms[i] - m) * (ms[i + k] - m)),
                    (acc, x) -> acc + x) / n AS term
        FROM ks
    ),
    lrvt AS (
        SELECT b.doc_id, b.n, b.lags, b.ms, b.m,
            greatest(list_reduce(
                list_prepend(b.lrv0, COALESCE(t.terms, [])),
                (acc, x) -> acc + x), 1e-12) AS lrv
        FROM base b LEFT JOIN (
            SELECT doc_id, list(term ORDER BY k) AS terms FROM tk
            GROUP BY doc_id
        ) t ON t.doc_id = b.doc_id
    ),
    eta AS (
        SELECT doc_id, n, lags,
            list_reduce(list_transform(generate_series(1, CAST(n AS INTEGER)),
                t -> list_reduce(list_transform(generate_series(1, t),
                         i -> ms[i] - m), (acc, x) -> acc + x)
                     * list_reduce(list_transform(generate_series(1, t),
                         i -> ms[i] - m), (acc, x) -> acc + x)),
                (acc, x) -> acc + x) / ((n * n) * lrv) AS stat
        FROM lrvt
    )
    SELECT doc_id, stat AS statistic,
           CASE WHEN stat < 0.347e0
                THEN 0.10e0 + 0.90e0 * (1.0e0 - stat / 0.347e0)
                WHEN stat < 0.463e0
                THEN 0.05e0 + 0.05e0 * (0.463e0 - stat)
                     / (0.463e0 - 0.347e0)
                WHEN stat < 0.739e0
                THEN 0.01e0 + 0.04e0 * (0.739e0 - stat)
                     / (0.739e0 - 0.463e0)
                ELSE 0.01e0 * (1.0e0 - least(stat - 0.739e0, 1.0e0))
                END AS p_value,
           CAST(lags AS BIGINT) AS lags
    FROM eta
    """
    return q, sql


def build_wave5_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("forecast_holt_w8",) + _forecast_holt_query(8)))
    add(*(("forecast_hw_add_w8",) + _forecast_hw_query(8)))
    add(*(("forecast_tsb_w8",) + _forecast_tsb_query(8)))
    add(*(("forecast_seasonal_es_w8",) + _forecast_seasonal_es_query(8)))
    add(*(("doc_durbin_watson",) + _durbin_watson_query(8)))
    add(*(("doc_ljung_box",) + _ljung_box_query(8)))
    add(*(("doc_kpss",) + _kpss_query(8)))
    return queries, oracles
