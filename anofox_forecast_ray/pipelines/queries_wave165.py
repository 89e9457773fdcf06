"""Wave-165 queries: ratio-to-MA seasonal index, Pickands tail.

- lineitem_seasonal_index: the classical-decomposition seasonal
  indices for monthly revenue — centered 12-month moving average
  with half weights at the ends (exact integer numerator, ONE
  division by 24), ratio-to-MA per month, mean ratio per
  month-of-year (t-ordered folds), normalized so the 12 indices
  sum to 12. The textbook method the X-11 family grew out of,
  complementing the STL queries.
- events_pickands_tail: the Pickands extreme-value index of hourly
  counts, xi = ln((x_k - x_2k)/(x_2k - x_4k)) / ln 2 over
  descending order statistics with k = n//20 — the second tail
  estimator next to the Hill query, valid for ALL tail regimes
  (Hill needs xi > 0).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


# --------------------------------------------------- lineitem_seasonal_index
def _seasonal_index_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "month": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "l_shipdate" not in t.column_names:
                return empty
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "month": pa.array(uk.astype(np.int64)),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate(
                [("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(
                    pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_shipdate", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        mm = tree_reduce_tables(refs, merge).to_pandas()
        mm = mm.sort_values("month").reset_index(drop=True)
        months = mm["month"].to_numpy(np.int64)
        cents = mm["cents"].to_numpy(np.int64)
        m0 = int(months.min())
        span = int(months.max()) - m0 + 1
        v = np.zeros(span, dtype=np.int64)
        v[months - m0] = cents
        n = span

        ratios = {}  # moy -> list of (t, ratio)
        for t_i in range(6, n - 6):
            num = int(v[t_i - 6]) + int(v[t_i + 6])
            for j in range(t_i - 5, t_i + 6):
                num += 2 * int(v[j])
            cma = float(num) / 24.0
            ratio = float(int(v[t_i])) / cma
            moy = (m0 + t_i) % 12
            ratios.setdefault(moy, []).append((t_i, ratio))

        raw = {}
        for moy in range(12):
            rs = sorted(ratios.get(moy, []))
            acc = 0.0
            for _t, r in rs:
                acc = acc + r
            raw[moy] = acc / float(len(rs))
        tot = 0.0
        for moy in range(12):
            tot = tot + raw[moy]
        out_m, out_i = [], []
        for moy in range(12):
            out_m.append(moy)
            out_i.append(raw[moy] * (12.0 / tot))
        return pa.table({
            "month_of_year": pa.array(out_m,
                                      type=pa.int64()),
            "seasonal_index": pa.array(out_i,
                                       type=pa.float64()),
        })

    # month index in SQL: epoch months == year*12+month-1 - 1970*12
    sql = f"""
    WITH mrev AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS m,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                                        0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ),
    bounds AS (SELECT min(m) AS m0, max(m) AS m1 FROM mrev),
    grid AS MATERIALIZED (
        SELECT g.m - bounds.m0 AS t, g.m,
               COALESCE(mrev.cents, 0) AS v
        FROM (SELECT unnest(generate_series(
                  (SELECT m0 FROM bounds),
                  (SELECT m1 FROM bounds))) AS m) g
        CROSS JOIN bounds
        LEFT JOIN mrev ON mrev.m = g.m
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    cma AS (
        SELECT c.t, c.m, c.v,
               CAST((SELECT v FROM grid WHERE t = c.t - 6)
                    + (SELECT v FROM grid WHERE t = c.t + 6)
                    + 2 * (SELECT sum(v) FROM grid
                           WHERE t BETWEEN c.t - 5
                             AND c.t + 5) AS BIGINT) AS num
        FROM grid c CROSS JOIN nn
        WHERE c.t >= 6 AND c.t < nn.n - 6
    ),
    ratio AS (
        SELECT t, m % 12 AS moy,
               CAST(v AS DOUBLE)
                   / (CAST(num AS DOUBLE) / 24.0e0) AS r
        FROM cma
    ),
    raw AS (
        SELECT moy,
               list_reduce(list_prepend(0.0e0,
                   list(r ORDER BY t)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS rw
        FROM ratio GROUP BY moy
    ),
    tot AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(rw ORDER BY moy)), (x, y) -> x + y)
                   AS s
        FROM raw
    )
    SELECT CAST(raw.moy AS BIGINT) AS month_of_year,
           raw.rw * (12.0e0 / tot.s) AS seasonal_index
    FROM raw CROSS JOIN tot
    ORDER BY raw.moy
    """
    return q, sql


# ----------------------------------------------------- events_pickands_tail
def _pickands_query():
    def q(sf_dir: str):
        from .queries_wave160 import _hourly

        y = _hourly(sf_dir)
        n = len(y)
        ys = np.sort(y)[::-1]  # descending
        k = n // 20
        xk = int(ys[k - 1])
        x2k = int(ys[2 * k - 1])
        x4k = int(ys[4 * k - 1])
        xi = math.log(float(xk - x2k)
                      / float(x2k - x4k)) / math.log(2.0)
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "k": pa.array([k], type=pa.int64()),
            "x_k": pa.array([xk], type=pa.int64()),
            "x_2k": pa.array([x2k], type=pa.int64()),
            "x_4k": pa.array([x4k], type=pa.int64()),
            "xi_pickands": pa.array([xi],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) // 20 AS k
           FROM grid),
    rk AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC)
                   AS r
        FROM grid
    ),
    xs AS (
        SELECT
            (SELECT cnt FROM rk, nn WHERE r = nn.k) AS xk,
            (SELECT cnt FROM rk, nn WHERE r = 2 * nn.k)
                AS x2k,
            (SELECT cnt FROM rk, nn WHERE r = 4 * nn.k)
                AS x4k
    )
    SELECT nn.n AS n_hours,
           nn.k AS k,
           xs.xk AS x_k,
           xs.x2k AS x_2k,
           xs.x4k AS x_4k,
           ln(CAST(xs.xk - xs.x2k AS DOUBLE)
              / CAST(xs.x2k - xs.x4k AS DOUBLE))
               / ln(2.0e0) AS xi_pickands
    FROM nn CROSS JOIN xs
    """
    return q, sql


def build_wave165_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_seasonal_index",)
          + _seasonal_index_query()))
    add(*(("events_pickands_tail",) + _pickands_query()))
    return queries, oracles
