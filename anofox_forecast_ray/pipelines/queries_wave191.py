"""Wave-191 queries: OLS influence diagnostics, White test.

Regression-diagnostics completion for the monthly revenue trend
y_t = a + b*t (t = month index, y = exact monthly revenue cents):

- lineitem_ols_influence: per-month LEVERAGE h_t = 1/n +
  (t - tbar)^2/Sxx and Cook's distance D_t = e_t^2 h_t /
  (p s^2 (1 - h_t)^2) with p = 2 and s^2 = SSE/(n-2) — the standard
  influence screen for "which month is dragging the trend". Month
  sums are exact ints; all float reductions are sequential folds in
  month order (list_reduce); per-row formulas are elementwise.
- lineitem_white_test: White's heteroskedasticity test — the
  auxiliary regression of e_t^2 on [1, t, t^2] (BP plus the square
  term), LM = n * R^2_aux ~ chi2(2). The 3x3 normal equations use
  the same cofactor Cramer spelling as wave-189 (cross-checked with
  numpy.lstsq in the unit test).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def _monthly_cents(sf_dir: str):
    """(month_index_0based, cents) exact monthly revenue table."""
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        month = (ship.astype("datetime64[us]")
                 .astype("datetime64[M]").astype(np.int64))
        cents = np.round(t.column("l_extendedprice").to_numpy(
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
        read_cols(sf_dir, "lineitem", ["l_shipdate", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    m = tree_reduce_tables(refs, merge).to_pandas()
    m = m.sort_values("month").reset_index(drop=True)
    lo = int(m["month"].min())
    return ((m["month"].to_numpy(np.int64) - lo),
            m["cents"].to_numpy(np.int64))


def _fold(vals):
    s = 0.0
    for v in vals:
        s = s + v
    return s


def ols_line(t: np.ndarray, y: np.ndarray):
    """(a, b, n) with sequential folds in t order."""
    n = t.size
    mx = _fold(float(v) for v in t) / n
    my = _fold(float(v) for v in y) / n
    sxy = _fold((float(a) - mx) * (float(b) - my)
                for a, b in zip(t, y))
    sxx = _fold((float(a) - mx) * (float(a) - mx) for a in t)
    b = sxy / sxx
    return my - b * mx, b, n, mx, sxx


# -------------------------------------------- lineitem_ols_influence
def _influence_query():
    def q(sf_dir: str):
        import ray.data as rd

        t, y = _monthly_cents(sf_dir)
        a, b, n, mx, sxx = ols_line(t, y)
        e = np.array([float(int(v)) - (a + b * float(int(x)))
                      for x, v in zip(t, y)])
        sse = _fold(v * v for v in e)
        s2 = sse / (n - 2)
        h = np.array([1.0e0 / n
                      + (float(int(x)) - mx) * (float(int(x)) - mx)
                      / sxx for x in t])
        cd = (e * e) * h / (2.0e0 * s2 * (1.0e0 - h)
                            * (1.0e0 - h))
        tbl = pa.table({
            "t_month": pa.array(t, type=pa.int64()),
            "leverage": pa.array(h, type=pa.float64()),
            "cooks_d": pa.array(cd, type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    sql = """
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ),
    pts AS (
        SELECT month - (SELECT min(month) FROM mm) AS t,
               cents
        FROM mm
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
    mu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(t AS DOUBLE) ORDER BY t)),
                   (p, v) -> p + v)
                   / CAST((SELECT n FROM nn) AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(cents AS DOUBLE) ORDER BY t)),
                   (p, v) -> p + v)
                   / CAST((SELECT n FROM nn) AS DOUBLE) AS my
        FROM pts
    ),
    st AS (
        SELECT mu.mx, mu.my,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(t AS DOUBLE) - mu.mx)
                        * (CAST(cents AS DOUBLE) - mu.my)
                        ORDER BY t)), (p, v) -> p + v) AS sxy,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(t AS DOUBLE) - mu.mx)
                        * (CAST(t AS DOUBLE) - mu.mx)
                        ORDER BY t)), (p, v) -> p + v) AS sxx
        FROM pts CROSS JOIN mu GROUP BY mu.mx, mu.my
    ),
    ab AS (
        SELECT mx, sxx,
               my - (sxy / sxx) * mx AS a,
               sxy / sxx AS b
        FROM st
    ),
    sse AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((CAST(cents AS DOUBLE)
                         - (ab.a + ab.b * CAST(t AS DOUBLE)))
                        * (CAST(cents AS DOUBLE)
                           - (ab.a + ab.b * CAST(t AS DOUBLE)))
                        ORDER BY t)), (p, v) -> p + v)
               / CAST((SELECT n FROM nn) - 2 AS DOUBLE) AS s2
        FROM pts CROSS JOIN ab
    )
    SELECT CAST(pts.t AS BIGINT) AS t_month,
           1.0e0 / CAST((SELECT n FROM nn) AS DOUBLE)
           + (CAST(pts.t AS DOUBLE) - ab.mx)
             * (CAST(pts.t AS DOUBLE) - ab.mx) / ab.sxx
               AS leverage,
           ((CAST(pts.cents AS DOUBLE)
             - (ab.a + ab.b * CAST(pts.t AS DOUBLE)))
            * (CAST(pts.cents AS DOUBLE)
               - (ab.a + ab.b * CAST(pts.t AS DOUBLE))))
           * (1.0e0 / CAST((SELECT n FROM nn) AS DOUBLE)
              + (CAST(pts.t AS DOUBLE) - ab.mx)
                * (CAST(pts.t AS DOUBLE) - ab.mx) / ab.sxx)
           / (2.0e0 * sse.s2
              * (1.0e0 - (1.0e0 / CAST((SELECT n FROM nn)
                                       AS DOUBLE)
                          + (CAST(pts.t AS DOUBLE) - ab.mx)
                            * (CAST(pts.t AS DOUBLE) - ab.mx)
                            / ab.sxx))
              * (1.0e0 - (1.0e0 / CAST((SELECT n FROM nn)
                                       AS DOUBLE)
                          + (CAST(pts.t AS DOUBLE) - ab.mx)
                            * (CAST(pts.t AS DOUBLE) - ab.mx)
                            / ab.sxx))) AS cooks_d
    FROM pts CROSS JOIN ab CROSS JOIN sse
    """
    return q, sql


def cramer3(fn, f1, f2, f11, f12, f22, fy, f1y, f2y):
    """Solve the 3x3 normal equations by cofactor Cramer expansion
    (identical spelling to the SQL); returns (a, b, c)."""
    det = (fn * (f11 * f22 - f12 * f12)
           - f1 * (f1 * f22 - f12 * f2)
           + f2 * (f1 * f12 - f11 * f2))
    a = (fy * (f11 * f22 - f12 * f12)
         - f1 * (f1y * f22 - f12 * f2y)
         + f2 * (f1y * f12 - f11 * f2y)) / det
    b = (fn * (f1y * f22 - f12 * f2y)
         - fy * (f1 * f22 - f12 * f2)
         + f2 * (f1 * f2y - f1y * f2)) / det
    c = (fn * (f11 * f2y - f1y * f12)
         - f1 * (f1 * f2y - f1y * f2)
         + fy * (f1 * f12 - f11 * f2)) / det
    return a, b, c


# ---------------------------------------------- lineitem_white_test
def _white_query():
    def q(sf_dir: str):
        t, y = _monthly_cents(sf_dir)
        a, b, n, mx, sxx = ols_line(t, y)
        z = [(float(int(v)) - (a + b * float(int(x))))
             * (float(int(v)) - (a + b * float(int(x))))
             for x, v in zip(t, y)]
        x1 = [float(int(v)) for v in t]
        x2 = [float(int(v)) * float(int(v)) for v in t]
        fn = float(n)
        f1 = _fold(x1)
        f2 = _fold(x2)
        f11 = _fold(v * v for v in x1)
        f12 = _fold(p * q for p, q in zip(x1, x2))
        f22 = _fold(v * v for v in x2)
        fy = _fold(z)
        f1y = _fold(p * q for p, q in zip(x1, z))
        f2y = _fold(p * q for p, q in zip(x2, z))
        ca, cb, cc = cramer3(fn, f1, f2, f11, f12, f22,
                             fy, f1y, f2y)
        zbar = fy / fn
        sst = _fold((v - zbar) * (v - zbar) for v in z)
        ssr = _fold((v - (ca + cb * p + cc * s))
                    * (v - (ca + cb * p + cc * s))
                    for v, p, s in zip(z, x1, x2))
        r2 = 1.0e0 - ssr / sst
        lm = fn * r2
        return pa.table({
            "n_months": pa.array([n], type=pa.int64()),
            "r2_aux": pa.array([r2], type=pa.float64()),
            "lm_white": pa.array([lm], type=pa.float64()),
        })

    sql = """
    WITH mm AS (
        SELECT (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY 1
    ),
    pts AS (
        SELECT month - (SELECT min(month) FROM mm) AS t, cents
        FROM mm
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
    mu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(t AS DOUBLE) ORDER BY t)),
                   (p, v) -> p + v)
                   / CAST((SELECT n FROM nn) AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(cents AS DOUBLE) ORDER BY t)),
                   (p, v) -> p + v)
                   / CAST((SELECT n FROM nn) AS DOUBLE) AS my
        FROM pts
    ),
    st AS (
        SELECT mu.mx, mu.my,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(t AS DOUBLE) - mu.mx)
                        * (CAST(cents AS DOUBLE) - mu.my)
                        ORDER BY t)), (p, v) -> p + v) AS sxy,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(t AS DOUBLE) - mu.mx)
                        * (CAST(t AS DOUBLE) - mu.mx)
                        ORDER BY t)), (p, v) -> p + v) AS sxx
        FROM pts CROSS JOIN mu GROUP BY mu.mx, mu.my
    ),
    ab AS (
        SELECT my - (sxy / sxx) * mx AS a, sxy / sxx AS b FROM st
    ),
    aux AS (
        SELECT t,
               CAST(t AS DOUBLE) AS x1,
               CAST(t AS DOUBLE) * CAST(t AS DOUBLE) AS x2,
               (CAST(cents AS DOUBLE)
                - (ab.a + ab.b * CAST(t AS DOUBLE)))
               * (CAST(cents AS DOUBLE)
                  - (ab.a + ab.b * CAST(t AS DOUBLE))) AS z
        FROM pts CROSS JOIN ab
    ),
    mo AS (
        SELECT CAST((SELECT n FROM nn) AS DOUBLE) AS fn,
               list_reduce(list_prepend(0.0e0,
                   list(x1 ORDER BY t)), (p, v) -> p + v) AS f1,
               list_reduce(list_prepend(0.0e0,
                   list(x2 ORDER BY t)), (p, v) -> p + v) AS f2,
               list_reduce(list_prepend(0.0e0,
                   list(x1 * x1 ORDER BY t)), (p, v) -> p + v)
                   AS f11,
               list_reduce(list_prepend(0.0e0,
                   list(x1 * x2 ORDER BY t)), (p, v) -> p + v)
                   AS f12,
               list_reduce(list_prepend(0.0e0,
                   list(x2 * x2 ORDER BY t)), (p, v) -> p + v)
                   AS f22,
               list_reduce(list_prepend(0.0e0,
                   list(z ORDER BY t)), (p, v) -> p + v) AS fy,
               list_reduce(list_prepend(0.0e0,
                   list(x1 * z ORDER BY t)), (p, v) -> p + v)
                   AS f1y,
               list_reduce(list_prepend(0.0e0,
                   list(x2 * z ORDER BY t)), (p, v) -> p + v)
                   AS f2y
        FROM aux
    ),
    sol AS (
        SELECT fn, fy,
            (fy * (f11 * f22 - f12 * f12)
             - f1 * (f1y * f22 - f12 * f2y)
             + f2 * (f1y * f12 - f11 * f2y))
            / (fn * (f11 * f22 - f12 * f12)
               - f1 * (f1 * f22 - f12 * f2)
               + f2 * (f1 * f12 - f11 * f2)) AS ca,
            (fn * (f1y * f22 - f12 * f2y)
             - fy * (f1 * f22 - f12 * f2)
             + f2 * (f1 * f2y - f1y * f2))
            / (fn * (f11 * f22 - f12 * f12)
               - f1 * (f1 * f22 - f12 * f2)
               + f2 * (f1 * f12 - f11 * f2)) AS cb,
            (fn * (f11 * f2y - f1y * f12)
             - f1 * (f1 * f2y - f1y * f2)
             + fy * (f1 * f12 - f11 * f2))
            / (fn * (f11 * f22 - f12 * f12)
               - f1 * (f1 * f22 - f12 * f2)
               + f2 * (f1 * f12 - f11 * f2)) AS cc
        FROM mo
    ),
    rr AS (
        SELECT sol.fn,
               list_reduce(list_prepend(0.0e0,
                   list((z - sol.fy / sol.fn)
                        * (z - sol.fy / sol.fn) ORDER BY t)),
                   (p, v) -> p + v) AS sst,
               list_reduce(list_prepend(0.0e0,
                   list((z - (sol.ca + sol.cb * x1
                              + sol.cc * x2))
                        * (z - (sol.ca + sol.cb * x1
                                + sol.cc * x2)) ORDER BY t)),
                   (p, v) -> p + v) AS ssr
        FROM aux CROSS JOIN sol
        GROUP BY sol.fn
    )
    SELECT CAST(fn AS BIGINT) AS n_months,
           1.0e0 - ssr / sst AS r2_aux,
           fn * (1.0e0 - ssr / sst) AS lm_white
    FROM rr
    """
    return q, sql


def build_wave191_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_ols_influence",) + _influence_query()))
    add(*(("lineitem_white_test",) + _white_query()))
    return queries, oracles
