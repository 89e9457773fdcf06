"""Wave-183 queries: I-MR control chart, Pp/Ppk process capability.

- events_imr_chart: the Shewhart INDIVIDUALS + MOVING-RANGE chart over
  the daily error-count series (zero-filled across the full event-day
  span — a silent day is a real observation). MR_d = |x_d - x_{d-1}|
  are exact integers, so sum(MR) is an int64 and MRbar/xbar are single
  divisions; control limits use the standard constants 2.66 (=3/d2)
  and 3.267 (=D4) as exact decimal literals on both sides. Violation
  counts compare exact ints to identically-computed doubles.
- lineitem_pp_ppk: OVERALL process capability of l_quantity against
  spec [1, 50]: Pp = (USL-LSL)/(6s), Ppk = min(USL-mu, mu-LSL)/(3s),
  with mu and s spelled from integer moments (n, sum x, sum x^2) and
  the explicit (S2 - S1^2/n)/(n-1) variance — the moment formula the
  bitwise-parity invariant requires (never DuckDB stddev).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


def imr_stats(x: np.ndarray):
    """(mr_bar, ucl_x, lcl_x, n_viol_x, n_viol_mr) from the daily
    integer series; folds mirror the SQL term-for-term."""
    x = x.astype(np.int64)
    d = x.size
    mr = np.abs(np.diff(x))
    mr_sum = int(mr.sum())
    mr_bar = mr_sum / (d - 1)
    xbar = int(x.sum()) / d
    ucl = xbar + 2.66e0 * mr_bar
    lcl = xbar - 2.66e0 * mr_bar
    ucl_mr = 3.267e0 * mr_bar
    n_viol_x = int(((x > ucl) | (x < lcl)).sum())
    n_viol_mr = int((mr > ucl_mr).sum())
    return mr_bar, ucl, lcl, n_viol_x, n_viol_mr


# --------------------------------------------------------- events_imr_chart
def _imr_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if tus.size == 0:
                return pa.table({
                    "day": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                })
            day = tus // US_PER_DAY
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error")
            lo = int(day.min())
            hi = int(day.max())
            errd = day[err]
            cnt = np.bincount((errd - lo).astype(np.int64),
                              minlength=hi - lo + 1).astype(np.int64)
            return pa.table({
                "day": pa.array(
                    np.arange(lo, hi + 1, dtype=np.int64)),
                "c": pa.array(cnt),
                # carry span so zero-filled days survive the merge
                "lo": pa.array(np.full(hi - lo + 1, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(hi - lo + 1, hi,
                                       dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            lo = int(df["lo"].min())
            hi = int(df["hi"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            g = df.groupby("day")["c"].sum()
            c = np.zeros(grid.size, dtype=np.int64)
            idx = (g.index.to_numpy(np.int64) - lo)
            c[idx] = g.to_numpy(np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(c),
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
        x = h["c"].to_numpy(np.int64)
        mr_bar, ucl, lcl, nvx, nvm = imr_stats(x)
        return pa.table({
            "n_days": pa.array([x.size], type=pa.int64()),
            "mr_bar": pa.array([mr_bar], type=pa.float64()),
            "ucl_x": pa.array([ucl], type=pa.float64()),
            "lcl_x": pa.array([lcl], type=pa.float64()),
            "n_viol_x": pa.array([nvx], type=pa.int64()),
            "n_viol_mr": pa.array([nvm], type=pa.int64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.err, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_err) AS err FROM e GROUP BY day
        ) c ON g.day = c.day
    ),
    mr AS (
        SELECT day, x,
               abs(x - lag(x) OVER (ORDER BY day)) AS m
        FROM d
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS nd,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(m) AS BIGINT) AS sm
        FROM mr
    ),
    lim AS (
        SELECT nd,
               CAST(sm AS DOUBLE) / CAST(nd - 1 AS DOUBLE) AS mrb,
               CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE) AS xb
        FROM s
    )
    SELECT lim.nd AS n_days,
           lim.mrb AS mr_bar,
           lim.xb + 2.66e0 * lim.mrb AS ucl_x,
           lim.xb - 2.66e0 * lim.mrb AS lcl_x,
           (SELECT CAST(sum(CASE WHEN CAST(x AS DOUBLE)
                     > lim.xb + 2.66e0 * lim.mrb
                    OR CAST(x AS DOUBLE)
                     < lim.xb - 2.66e0 * lim.mrb
                   THEN 1 ELSE 0 END) AS BIGINT) FROM mr)
               AS n_viol_x,
           (SELECT CAST(sum(CASE WHEN CAST(m AS DOUBLE)
                     > 3.267e0 * lim.mrb
                   THEN 1 ELSE 0 END) AS BIGINT)
            FROM mr WHERE m IS NOT NULL) AS n_viol_mr
    FROM lim
    """
    return q, sql


# --------------------------------------------------------- lineitem_pp_ppk
def _ppk_query(lsl: int = 1, usl: int = 50):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            return pa.table({
                "n": pa.array([qty.size], type=pa.int64()),
                "s1": pa.array([int(qty.sum())], type=pa.int64()),
                "s2": pa.array([int((qty * qty).sum())],
                               type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                "n": pa.array([int(t.column("n").to_numpy().sum())],
                              type=pa.int64()),
                "s1": pa.array(
                    [int(t.column("s1").to_numpy().sum())],
                    type=pa.int64()),
                "s2": pa.array(
                    [int(t.column("s2").to_numpy().sum())],
                    type=pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_quantity"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        n = int(m["n"].iloc[0])
        s1 = int(m["s1"].iloc[0])
        s2 = int(m["s2"].iloc[0])
        mu = s1 / n
        var = (s2 - (s1 * s1) / n) / (n - 1)
        s = math.sqrt(var)
        pp = (usl - lsl) / (6.0e0 * s)
        ppk = min(usl - mu, mu - lsl) / (3.0e0 * s)
        return pa.table({
            "n_rows": pa.array([n], type=pa.int64()),
            "pp": pa.array([pp], type=pa.float64()),
            "ppk": pa.array([ppk], type=pa.float64()),
        })

    sql = f"""
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS s1,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT)
                        * CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS s2
        FROM lineitem
    ),
    m AS (
        SELECT n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               sqrt((CAST(s2 AS DOUBLE)
                     - CAST(s1 * s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(n - 1 AS DOUBLE)) AS sd
        FROM s
    )
    SELECT n AS n_rows,
           CAST({usl} - {lsl} AS DOUBLE) / (6.0e0 * sd) AS pp,
           least({usl}.0e0 - mu, mu - {lsl}.0e0) / (3.0e0 * sd)
               AS ppk
    FROM m
    """
    return q, sql


def build_wave183_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_imr_chart",) + _imr_query()))
    add(*(("lineitem_pp_ppk",) + _ppk_query()))
    return queries, oracles
