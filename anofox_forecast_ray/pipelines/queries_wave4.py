"""Fourth query wave: baseline forecasters (RWD / window average /
historic average / Croston) and window transforms (rolling min-max,
robust scale) — each with an exact DuckDB oracle following the standard
discipline (integer window sums where possible; sequential list_reduce
folds for every float accumulation the kernel performs sequentially).
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
    corpus_docs,
    corpus_ds,
)


def _forecast_rwd_query(width: int, horizon: int = 2):
    """RandomWalkWithDrift: yhat(h) = y_n + h * (y_n - y_1)/(n - 1)
    (kernels/baseline.rwd_fit; sma.rs drift semantics)."""
    q = _forecast_query(width, "rwd", {}, horizon)
    sql = f"""
    {_series_list_sql(width)}
    SELECT doc_id, 'rwd' AS model, CAST(hh.h AS INTEGER) AS h,
           ms[n] + hh.h * ((ms[n] - ms[1]) / (n - 1)) AS yhat
    FROM l CROSS JOIN (SELECT unnest(generate_series(1, {horizon})) AS h) hh
    """
    return q, sql


def _forecast_window_avg_query(width: int, window: int = 4):
    """WindowAverage: flat forecast at mean(last ``window`` means). The
    kernel's np.mean over 4 elements is a sequential fold (numpy only
    switches to pairwise blocks above 8), so the SQL left-to-right sum is
    bitwise-identical."""
    q = _forecast_query(width, "window_average", {"window": window}, 1)
    terms = " + ".join(f"ms[n - {window - 1 - j}]" for j in range(window))
    sql = f"""
    {_series_list_sql(width)}
    SELECT doc_id, 'window_average' AS model, CAST(1 AS INTEGER) AS h,
           ({terms}) / CAST({window} AS DOUBLE) AS yhat
    FROM l WHERE n >= {window}
    """
    return q, sql


def _forecast_historic_avg_query(width: int):
    """HistoricAverage: flat forecast at the global mean — the kernel
    computes it from a cumsum (sequential fold), mirrored by
    list_reduce."""
    q = _forecast_query(width, "historic_average", {}, 1)
    sql = f"""
    {_series_list_sql(width)}
    SELECT doc_id, 'historic_average' AS model, CAST(1 AS INTEGER) AS h,
           list_reduce(ms, (acc, x) -> acc + x) / CAST(n AS DOUBLE) AS yhat
    FROM l
    """
    return q, sql


def _forecast_croston_query(width: int, modulus: int = 25,
                            alpha: float = 0.1,
                            variant: str = "classic"):
    """Croston classic/SBA over a genuinely intermittent series: per doc,
    demand(w) = count of tokens in window w with token % modulus == 0
    over the FULL window grid (zeros where no token matches). Forecast =
    ses(demands) / max(ses(intervals), 0.001) with the reference's
    interval convention (first interval = first demand position + 1,
    kernels/intermittent.demands_intervals)."""

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
                for s0, s1 in zip(bounds, ends):
                    # rollup_flat_masked emits every window of the doc
                    # (cnt = matching tokens, 0 where none): the dense
                    # intermittent demand series
                    y = r["cnt"][s0:s1].astype(np.float64)
                    if y.size < 4 or (y > 0).sum() < 2:
                        continue
                    m = make_model("croston", variant=variant,
                                   alpha=alpha)
                    m.fit(y)
                    out_doc.append(ids[ridx[s0]])
                    out_yhat.append(float(m.predict(1)[0]))
            return pa.table(
                {
                    "doc_id": pa.array(out_doc, type=pa.string()),
                    "model": pa.array(
                        [f"croston_{variant}"] * len(out_doc)
                    ),
                    "h": pa.array([1] * len(out_doc), type=pa.int32()),
                    "yhat": pa.array(out_yhat, type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(fc, batch_format="pyarrow"),
            FORECAST_SCHEMA,
        )

    a = alpha
    # SBA bias correction: classic ratio * (1 - alpha/2)
    factor = f" * (1.0e0 - {alpha}e0 / 2.0e0)" if variant == "sba" else ""
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
               CAST(count(*) AS BIGINT) AS n,
               list(d ORDER BY w) FILTER (WHERE d > 0) AS demands,
               list(w ORDER BY w) FILTER (WHERE d > 0) AS dpos
        FROM grid GROUP BY doc_id
        HAVING count(*) >= 4 AND count(*) FILTER (WHERE d > 0) >= 2
    ),
    iv AS (
        SELECT doc_id, demands,
               list_transform(generate_series(1, len(dpos)),
                   i -> CAST(CASE WHEN i = 1 THEN dpos[1] + 1
                                  ELSE dpos[i] - dpos[i - 1] END AS DOUBLE))
                 AS intervals
        FROM lists
    )
    SELECT doc_id, 'croston_{variant}' AS model, CAST(1 AS INTEGER) AS h,
           list_reduce(demands, (acc, x) -> {a}e0 * x + (1.0e0 - {a}e0) * acc)
           / greatest(
               list_reduce(intervals,
                           (acc, x) -> {a}e0 * x + (1.0e0 - {a}e0) * acc),
               0.001e0){factor} AS yhat
    FROM iv
    """
    return q, sql


def _rolling_minmax_query(width: int, window: int = 4):
    """Trailing rolling min/max of the INT window sums per doc (warm-up
    dropped) — exercises kernels/windows rolling_min/rolling_max with an
    exact integer oracle."""

    def q(sf_dir: str):
        from ..kernels.rollup import rollup_flat
        from ..kernels.windows import rolling_max, rolling_min
        from ..stages.rollup import _flat_tokens

        def roll(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            r = rollup_flat(values, lengths, width)
            ridx = r["row_idx"]
            ids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "window_id": [], "roll_min": [],
                   "roll_max": []}
            if ridx.size:
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                for s0, s1 in zip(bounds, ends):
                    s = r["sum"][s0:s1].astype(np.float64)
                    lo = rolling_min(s, window)
                    hi = rolling_max(s, window)
                    ok = np.isfinite(lo)
                    wid = r["window_id"][s0:s1][ok]
                    out["doc_id"].extend([ids[ridx[s0]]] * int(ok.sum()))
                    out["window_id"].extend(wid.tolist())
                    out["roll_min"].extend(lo[ok].astype(np.int64).tolist())
                    out["roll_max"].extend(hi[ok].astype(np.int64).tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"], type=pa.int64()),
                    "roll_min": pa.array(out["roll_min"], type=pa.int64()),
                    "roll_max": pa.array(out["roll_max"], type=pa.int64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(roll, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "roll_min": pa.int64(), "roll_max": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS window_id,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, window_id
    )
    SELECT doc_id, window_id,
           CAST(min(s) OVER win AS BIGINT) AS roll_min,
           CAST(max(s) OVER win AS BIGINT) AS roll_max
    FROM w
    WINDOW win AS (PARTITION BY doc_id ORDER BY window_id
                   ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
    QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY window_id)
            >= {window}
    """
    return q, sql


def _robust_scale_query():
    """robust_scale of doc lengths per source: (n_tok - median) / IQR
    with numpy's linear-interpolation percentiles == DuckDB
    quantile_cont (kernels/scale.robust_scale; src/transform/scale.rs)."""

    def q(sf_dir: str):
        import pandas as pd

        from ..kernels.scale import robust_scale

        def z(g: pd.DataFrame) -> pd.DataFrame:
            v = g["n_tok"].to_numpy(dtype=np.float64)
            scaled, med, iqr = robust_scale(v)
            return pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "source": g["source"].to_numpy(),
                    "robust_n_tok": scaled,
                }
            )

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "doc_id": t.column("doc_id").cast(pa.string()),
                    "source": t.column("source"),
                    "n_tok": pc.utf8_length(t.column("text")).cast(pa.int64()),
                }
            )

        ds = (
            corpus_docs(sf_dir)
            .map_batches(prep, batch_format="pyarrow")
            .groupby("source")
            .map_groups(z, batch_format="pandas")
        )
        return _cast(
            ds,
            {"doc_id": pa.string(), "source": pa.string(),
             "robust_n_tok": pa.float64()},
        )

    sql = """
    WITH d AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
               CAST(length(text) AS DOUBLE) AS n_tok
        FROM documents
    ),
    stats AS (
        SELECT source,
               quantile_cont(n_tok, 0.5) AS med,
               quantile_cont(n_tok, 0.75) - quantile_cont(n_tok, 0.25) AS iqr
        FROM d GROUP BY source
    )
    SELECT d.doc_id, d.source,
           CASE WHEN st.iqr = 0 THEN 0.0e0
                ELSE (d.n_tok - st.med) / st.iqr END AS robust_n_tok
    FROM d JOIN stats st USING (source)
    """
    return q, sql


def _ewm_query(width: int, alpha: float = 0.5):
    """Per-window EWM mean (alpha=0.5 keeps every step an exact halving)
    over each doc's w{width} mean series — exercises kernels/windows
    ewm_mean; the oracle replays the recurrence with a recursive CTE."""

    def q(sf_dir: str):
        from ..kernels.rollup import rollup_flat
        from ..kernels.windows import ewm_mean
        from ..stages.rollup import _flat_tokens

        def roll(t: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(t)
            r = rollup_flat(values, lengths, width)
            ridx = r["row_idx"]
            ids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "window_id": [], "ewm": []}
            if ridx.size:
                means = r["sum"].astype(np.float64) / r["cnt"]
                bounds = np.flatnonzero(
                    np.concatenate(([True], ridx[1:] != ridx[:-1]))
                )
                ends = np.concatenate((bounds[1:], [ridx.size]))
                for s0, s1 in zip(bounds, ends):
                    e = ewm_mean(means[s0:s1], alpha)
                    out["doc_id"].extend([ids[ridx[s0]]] * (s1 - s0))
                    out["window_id"].extend(
                        r["window_id"][s0:s1].tolist()
                    )
                    out["ewm"].extend(e.tolist())
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], type=pa.string()),
                    "window_id": pa.array(out["window_id"], type=pa.int64()),
                    "ewm": pa.array(out["ewm"], type=pa.float64()),
                }
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(roll, batch_format="pyarrow"),
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "ewm": pa.float64()},
        )

    a = alpha
    sql = f"""
    WITH RECURSIVE tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY doc_id, wid
    ),
    r AS (
        SELECT doc_id, wid, m AS ewm FROM w WHERE wid = 0
        UNION ALL
        SELECT w.doc_id, w.wid,
               {a}e0 * w.m + (1.0e0 - {a}e0) * r.ewm
        FROM r JOIN w ON w.doc_id = r.doc_id AND w.wid = r.wid + 1
    )
    SELECT doc_id, CAST(wid AS BIGINT) AS window_id, ewm FROM r
    """
    return q, sql


def build_wave4_queries():
    queries, oracles = {}, {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("forecast_rwd_w8",) + _forecast_rwd_query(8)))
    add(*(("forecast_window_avg_w8",) + _forecast_window_avg_query(8)))
    add(*(("forecast_historic_avg_w8",) + _forecast_historic_avg_query(8)))
    add(*(("forecast_croston_w8",) + _forecast_croston_query(8)))
    add(*(("forecast_croston_sba_w8",)
          + _forecast_croston_query(8, variant="sba")))
    add(*(("doc_rolling_minmax_w8",) + _rolling_minmax_query(8)))
    add(*(("doc_robust_scale",) + _robust_scale_query()))
    add(*(("doc_ewm_w8",) + _ewm_query(8)))
    return queries, oracles
