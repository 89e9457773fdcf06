"""Wave-200 queries: Passing-Bablok regression, recursive residuals.

- lineitem_passing_bablok: the Passing-Bablok (1983) method-
  comparison regression between monthly total quantity (x) and
  monthly revenue dollars (y): all pairwise slopes S_ij =
  (y_j-y_i)/(x_j-x_i) with dx != 0 and S != -1, the offset
  K = #{S < -1}, and the K-shifted median slope; intercept =
  median(y - b x). Slopes are doubles derived from exact ints
  identically on both sides, and every selection is an explicit
  row_number pick over that shared double multiset (even counts
  average two adjacent order statistics — one /2).
- orders_recursive_residuals: the Brown-Durbin-Evans recursive
  residuals of the monthly revenue trend y_t = a + b t — the
  building block of the CUSUM parameter-stability test: for each
  r >= 3, fit OLS on the first r-1 months (closed forms from
  LAGGED cumulative integer sums) and emit
  w_r = (y_r - a - b r)/sqrt(1 + 1/(r-1) + (r - xbar)^2/Sxx).
  Emits the full (r, w_resid) path; every input sum is an exact
  int64 window cumulative.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

from .queries_wave193 import _monthly_qty
from .queries_wave191 import _monthly_cents


def passing_bablok(x: np.ndarray, y: np.ndarray):
    """(n_pairs, k_offset, slope, intercept); doubles everywhere,
    selections over the sorted double multiset."""
    n = x.size
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            dx = int(x[j]) - int(x[i])
            if dx == 0:
                continue
            s = (int(y[j]) - int(y[i])) / dx
            if s == -1.0:
                continue
            slopes.append(s)
    slopes.sort()
    N = len(slopes)
    k = 0
    for s in slopes:
        if s < -1.0:
            k += 1
    if N % 2 == 1:
        b = slopes[(N + 1) // 2 + k - 1]
    else:
        b = (slopes[N // 2 + k - 1] + slopes[N // 2 + k]) / 2.0e0
    resid = sorted(float(int(v)) - b * float(int(u))
                   for u, v in zip(x, y))
    m = len(resid)
    if m % 2 == 1:
        a = resid[m // 2]
    else:
        a = (resid[m // 2 - 1] + resid[m // 2]) / 2.0e0
    return N, k, b, a


# ---------------------------------------------- lineitem_passing_bablok
def _pb_query():
    def q(sf_dir: str):
        x = _monthly_qty(sf_dir)
        _, cents = _monthly_cents(sf_dir)
        y = cents // 100  # whole dollars, exact
        N, k, b, a = passing_bablok(x, y)
        return pa.table({
            "n_slopes": pa.array([N], type=pa.int64()),
            "k_offset": pa.array([k], type=pa.int64()),
            "pb_slope": pa.array([b], type=pa.float64()),
            "pb_intercept": pa.array([a], type=pa.float64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS x,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) // 100 AS y
        FROM lineitem GROUP BY 1
    ),
    sl AS (
        SELECT CAST(b.y - a.y AS DOUBLE)
                   / CAST(b.x - a.x AS DOUBLE) AS s
        FROM mm a JOIN mm b ON a.month < b.month
        WHERE b.x <> a.x
          AND CAST(b.y - a.y AS DOUBLE)
              / CAST(b.x - a.x AS DOUBLE) <> -1.0e0
    ),
    nk AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN s < -1.0e0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM sl
    ),
    rk AS (
        SELECT s, row_number() OVER (ORDER BY s) AS r FROM sl
    ),
    bb AS (
        SELECT CASE WHEN (SELECT n FROM nk) % 2 = 1
               THEN (SELECT s FROM rk
                     WHERE r = ((SELECT n FROM nk) + 1) // 2
                             + (SELECT k FROM nk))
               ELSE ((SELECT s FROM rk
                      WHERE r = (SELECT n FROM nk) // 2
                              + (SELECT k FROM nk))
                     + (SELECT s FROM rk
                        WHERE r = (SELECT n FROM nk) // 2
                                + (SELECT k FROM nk) + 1))
                    / 2.0e0
               END AS b
        FROM (SELECT 1)
    ),
    res AS (
        SELECT CAST(mm.y AS DOUBLE) - bb.b * CAST(mm.x AS DOUBLE)
                   AS v
        FROM mm CROSS JOIN bb
    ),
    rr AS (
        SELECT v, row_number() OVER (ORDER BY v) AS r,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM res
    ),
    aa AS (
        SELECT CASE WHEN (SELECT max(m) FROM rr) % 2 = 1
               THEN (SELECT v FROM rr
                     WHERE r = (SELECT max(m) FROM rr) // 2 + 1)
               ELSE ((SELECT v FROM rr
                      WHERE r = (SELECT max(m) FROM rr) // 2)
                     + (SELECT v FROM rr
                        WHERE r = (SELECT max(m) FROM rr) // 2
                                + 1)) / 2.0e0
               END AS a
        FROM (SELECT 1)
    )
    SELECT (SELECT n FROM nk) AS n_slopes,
           (SELECT k FROM nk) AS k_offset,
           bb.b AS pb_slope, aa.a AS pb_intercept
    FROM bb CROSS JOIN aa
    """
    return q, sql


# ------------------------------------------- orders_recursive_residuals
def _recresid_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries import _num_read_blocks

        US_PER_DAY = 86_400_000_000

        def partial(t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(t.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            uk, inv = np.unique(month, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({"month": pa.array(uk),
                             "cents": pa.array(cs)})

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("month").aggregate([("cents", "sum")])
            return pa.table({
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.sort_values("month").reset_index(drop=True)
        lo = int(m["month"].min())
        t = (m["month"].to_numpy(np.int64) - lo + 1)
        y = m["cents"].to_numpy(np.int64)
        rows_r, rows_w = [], []
        cn = 0
        sx = sy = sxx = sxy = 0
        for idx in range(t.size):
            tt = int(t[idx])
            yy = int(y[idx])
            if cn >= 2:
                fn = float(cn)
                den = fn * sxx - sx * sx
                b = (fn * float(sxy)
                     - float(sx) * float(sy)) / float(den)
                a = (float(sy) - b * float(sx)) / fn
                xbar = sx / cn
                sxxc = float(sxx) - float(sx) * float(sx) / fn
                h = (1.0e0 + 1.0e0 / fn
                     + (float(tt) - xbar) * (float(tt) - xbar)
                     / sxxc)
                w = (float(yy) - a - b * float(tt)) / math.sqrt(h)
                rows_r.append(tt)
                rows_w.append(w)
            cn += 1
            sx += tt
            sy += yy
            sxx += tt * tt
            sxy += tt * yy
        tbl = pa.table({
            "r": pa.array(rows_r, type=pa.int64()),
            "w_resid": pa.array(rows_w, type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    sql = """
    WITH mm AS (
        SELECT (year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1) AS month,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    pts AS (
        SELECT month - (SELECT min(month) FROM mm) + 1 AS t,
               cents AS y
        FROM mm
    ),
    cum AS (
        SELECT t, y,
               CAST(count(*) OVER w AS BIGINT) AS cn,
               CAST(coalesce(sum(t) OVER w, 0) AS BIGINT) AS sx,
               CAST(coalesce(sum(y) OVER w, 0) AS BIGINT) AS sy,
               CAST(coalesce(sum(t * t) OVER w, 0) AS BIGINT)
                   AS sxx,
               CAST(coalesce(sum(t * y) OVER w, 0) AS BIGINT)
                   AS sxy
        FROM pts
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING)
    ),
    calc AS (
        SELECT t, y, cn, sx, sy, sxx, sxy,
               CAST(cn AS DOUBLE) AS fn
        FROM cum WHERE cn >= 2
    ),
    ols AS (
        SELECT t, y, cn, sx, fn,
               (fn * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / CAST(fn * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                      AS DOUBLE) AS b,
               CAST(sy AS DOUBLE) AS fsy,
               CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / fn
                   AS sxxc
        FROM calc
    )
    SELECT CAST(t AS BIGINT) AS r,
           (CAST(y AS DOUBLE)
            - (fsy - b * CAST(sx AS DOUBLE)) / fn
            - b * CAST(t AS DOUBLE))
           / sqrt(1.0e0 + 1.0e0 / fn
                  + (CAST(t AS DOUBLE)
                     - CAST(sx AS DOUBLE) / CAST(cn AS DOUBLE))
                    * (CAST(t AS DOUBLE)
                       - CAST(sx AS DOUBLE) / CAST(cn AS DOUBLE))
                    / sxxc) AS w_resid
    FROM ols
    """
    return q, sql


def build_wave200_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_passing_bablok",) + _pb_query()))
    add(*(("orders_recursive_residuals",) + _recresid_query()))
    return queries, oracles
