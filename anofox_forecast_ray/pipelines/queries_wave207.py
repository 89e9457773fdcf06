"""Wave-207 queries: VAR(1) fit and impulse responses.

- events_var1_daily: a first-order vector autoregression of the 2-D
  daily series (error count, purchase count), both zero-filled over
  the day grid: A = (Y'X)(X'X)^{-1} with X the lagged matrix —
  closed-form 2x2 inverse over EXACT int64 cross-moments (centered
  via the doubled trick is unnecessary: raw uncentered VAR with an
  intercept absorbed by centering in doubles, spelled identically).
  Emits the 4 coefficients and the spectral radius |lambda_max| =
  the stability measure from the 2x2 eigenvalue closed form.
- events_var1_irf: the impulse-response function — the first 4
  powers A^k applied to a unit purchase shock e2, emitting the
  error-channel response at each horizon (the "do purchases
  precede errors" view that complements the Granger test).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
IRF_K = 4


def var1_fit(e: np.ndarray, p: np.ndarray):
    """A (2x2) + spectral radius from centered moments in doubles.
    Series are int64 daily counts; x = day t-1, y = day t."""
    T = e.size
    n = T - 1
    fn = float(n)
    ex, px = e[:-1], p[:-1]
    ey, py = e[1:], p[1:]

    def m(a, b):
        return float(int((a.astype(object) * b.astype(object))
                         .sum()))

    sx1 = float(int(ex.sum()))
    sx2 = float(int(px.sum()))
    sy1 = float(int(ey.sum()))
    sy2 = float(int(py.sum()))
    c11 = m(ex, ex) - sx1 * sx1 / fn
    c12 = m(ex, px) - sx1 * sx2 / fn
    c22 = m(px, px) - sx2 * sx2 / fn
    b11 = m(ey, ex) - sy1 * sx1 / fn
    b12 = m(ey, px) - sy1 * sx2 / fn
    b21 = m(py, ex) - sy2 * sx1 / fn
    b22 = m(py, px) - sy2 * sx2 / fn
    det = c11 * c22 - c12 * c12
    a11 = (b11 * c22 - b12 * c12) / det
    a12 = (b12 * c11 - b11 * c12) / det
    a21 = (b21 * c22 - b22 * c12) / det
    a22 = (b22 * c11 - b21 * c12) / det
    tr = a11 + a22
    dt = a11 * a22 - a12 * a21
    disc = tr * tr - 4.0e0 * dt
    if disc >= 0.0:
        r = max(abs((tr + math.sqrt(disc)) / 2.0e0),
                abs((tr - math.sqrt(disc)) / 2.0e0))
    else:
        r = math.sqrt(dt)
    return a11, a12, a21, a22, r


def var1_irf(a11, a12, a21, a22, k=IRF_K):
    """Error-channel response to a unit purchase shock."""
    v1, v2 = 0.0, 1.0
    out = []
    for i in range(1, k + 1):
        v1, v2 = a11 * v1 + a12 * v2, a21 * v1 + a22 * v2
        out.append((i, v1))
    return out


def _daily_ep(sf_dir: str):
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if tus.size == 0:
            return pa.table({
                "day": pa.array([], type=pa.int64()),
                "e": pa.array([], type=pa.int64()),
                "p": pa.array([], type=pa.int64()),
                "lo": pa.array([], type=pa.int64()),
                "hi": pa.array([], type=pa.int64()),
            })
        day = tus // US_PER_DAY
        et = np.asarray(t.column("event_type").to_pylist())
        lo, hi = int(day.min()), int(day.max())
        span = hi - lo + 1
        e = np.bincount((day[et == "error"] - lo).astype(np.int64),
                        minlength=span).astype(np.int64)
        p = np.bincount(
            (day[et == "purchase"] - lo).astype(np.int64),
            minlength=span).astype(np.int64)
        grid = np.arange(lo, hi + 1, dtype=np.int64)
        return pa.table({
            "day": pa.array(grid), "e": pa.array(e),
            "p": pa.array(p),
            "lo": pa.array(np.full(span, lo, dtype=np.int64)),
            "hi": pa.array(np.full(span, hi, dtype=np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        lo = int(df["lo"].min())
        hi = int(df["hi"].max())
        grid = np.arange(lo, hi + 1, dtype=np.int64)
        g = df.groupby("day")[["e", "p"]].sum()
        e = np.zeros(grid.size, dtype=np.int64)
        p = np.zeros(grid.size, dtype=np.int64)
        idx = g.index.to_numpy(np.int64) - lo
        e[idx] = g["e"].to_numpy(np.int64)
        p[idx] = g["p"].to_numpy(np.int64)
        return pa.table({
            "day": pa.array(grid), "e": pa.array(e),
            "p": pa.array(p),
            "lo": pa.array(np.full(grid.size, lo,
                                   dtype=np.int64)),
            "hi": pa.array(np.full(grid.size, hi,
                                   dtype=np.int64)),
        })

    refs = list(
        read_cols(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    h = tree_reduce_tables(refs, merge).to_pandas()
    h = h.sort_values("day").reset_index(drop=True)
    return (h["e"].to_numpy(np.int64), h["p"].to_numpy(np.int64))


_SQL_MOMENTS = f"""
    ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END AS is_p
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day,
               CAST(coalesce(c.e, 0) AS BIGINT) AS e,
               CAST(coalesce(c.p, 0) AS BIGINT) AS p
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e, sum(is_p) AS p
            FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    lagd AS (
        SELECT day, e AS ey, p AS py,
               lag(e) OVER (ORDER BY day) AS ex,
               lag(p) OVER (ORDER BY day) AS px
        FROM d
    ),
    pts AS (SELECT * FROM lagd WHERE ex IS NOT NULL),
    mo AS (
        SELECT CAST(count(*) AS DOUBLE) AS fn,
               CAST(sum(ex) AS DOUBLE) AS sx1,
               CAST(sum(px) AS DOUBLE) AS sx2,
               CAST(sum(ey) AS DOUBLE) AS sy1,
               CAST(sum(py) AS DOUBLE) AS sy2,
               CAST(sum(ex * ex) AS DOUBLE) AS mxx,
               CAST(sum(ex * px) AS DOUBLE) AS mxp,
               CAST(sum(px * px) AS DOUBLE) AS mpp,
               CAST(sum(ey * ex) AS DOUBLE) AS me_x,
               CAST(sum(ey * px) AS DOUBLE) AS me_p,
               CAST(sum(py * ex) AS DOUBLE) AS mp_x,
               CAST(sum(py * px) AS DOUBLE) AS mp_p
        FROM pts
    ),
    cc AS (
        SELECT
            mxx - sx1 * sx1 / fn AS c11,
            mxp - sx1 * sx2 / fn AS c12,
            mpp - sx2 * sx2 / fn AS c22,
            me_x - sy1 * sx1 / fn AS b11,
            me_p - sy1 * sx2 / fn AS b12,
            mp_x - sy2 * sx1 / fn AS b21,
            mp_p - sy2 * sx2 / fn AS b22
        FROM mo
    ),
    sol AS (
        SELECT
            (b11 * c22 - b12 * c12)
                / (c11 * c22 - c12 * c12) AS a11,
            (b12 * c11 - b11 * c12)
                / (c11 * c22 - c12 * c12) AS a12,
            (b21 * c22 - b22 * c12)
                / (c11 * c22 - c12 * c12) AS a21,
            (b22 * c11 - b21 * c12)
                / (c11 * c22 - c12 * c12) AS a22
        FROM cc
    )
"""


# ------------------------------------------------- events_var1_daily
def _var_query():
    def q(sf_dir: str):
        e, p = _daily_ep(sf_dir)
        a11, a12, a21, a22, r = var1_fit(e, p)
        return pa.table({
            "a_ee": pa.array([a11], type=pa.float64()),
            "a_ep": pa.array([a12], type=pa.float64()),
            "a_pe": pa.array([a21], type=pa.float64()),
            "a_pp": pa.array([a22], type=pa.float64()),
            "spec_radius": pa.array([r], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_MOMENTS}
    SELECT a11 AS a_ee, a12 AS a_ep, a21 AS a_pe, a22 AS a_pp,
           CASE WHEN (a11 + a22) * (a11 + a22)
                     - 4.0e0 * (a11 * a22 - a12 * a21) >= 0.0e0
                THEN greatest(
                    abs(((a11 + a22)
                         + sqrt((a11 + a22) * (a11 + a22)
                                - 4.0e0 * (a11 * a22
                                           - a12 * a21)))
                        / 2.0e0),
                    abs(((a11 + a22)
                         - sqrt((a11 + a22) * (a11 + a22)
                                - 4.0e0 * (a11 * a22
                                           - a12 * a21)))
                        / 2.0e0))
                ELSE sqrt(a11 * a22 - a12 * a21)
           END AS spec_radius
    FROM sol
    """
    return q, sql


# --------------------------------------------------- events_var1_irf
def _irf_query():
    def q(sf_dir: str):
        import ray.data as rd

        e, p = _daily_ep(sf_dir)
        a11, a12, a21, a22, _ = var1_fit(e, p)
        rows = var1_irf(a11, a12, a21, a22)
        tbl = pa.table({
            "horizon": pa.array([r[0] for r in rows],
                                type=pa.int64()),
            "err_response": pa.array([r[1] for r in rows],
                                     type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    # unrolled A^k e2 with MATERIALIZED layers
    layers = ["v0 AS MATERIALIZED (SELECT 0.0e0 AS v1, "
              "1.0e0 AS v2 FROM (SELECT 1))"]
    for k in range(1, IRF_K + 1):
        layers.append(f"""
    v{k} AS MATERIALIZED (
        SELECT sol.a11 * v{k - 1}.v1 + sol.a12 * v{k - 1}.v2
                   AS v1,
               sol.a21 * v{k - 1}.v1 + sol.a22 * v{k - 1}.v2
                   AS v2
        FROM v{k - 1} CROSS JOIN sol
    )""")
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS horizon, "
        f"v{k}.v1 AS err_response FROM v{k}"
        for k in range(1, IRF_K + 1))
    sql = f"""
    WITH {_SQL_MOMENTS},
    {",".join(layers)}
    {rows}
    """
    return q, sql


def build_wave207_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_var1_daily",) + _var_query()))
    add(*(("events_var1_irf",) + _irf_query()))
    return queries, oracles
