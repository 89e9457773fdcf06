"""Wave-189 queries: Bass diffusion fit, logistic growth fit.

- orders_bass_diffusion: the Bass (1969) new-product diffusion model
  fit by the classic discrete OLS n_t = a + b*N_{t-1} + c*N_{t-1}^2
  over the zero-filled month grid, where n_t = customers whose FIRST
  order falls in month t and N is the cumulative adopter count. The
  3x3 normal equations are solved by cofactor Cramer expansion in
  doubles built from exact int64 moments — spelled term-for-term on
  both sides (and, per the wave-99 rule, checked against
  numpy.lstsq in the unit test). Roots give (M, p, q) only when the
  discriminant and c have the textbook signs; else NULL on both
  sides.
- orders_logistic_growth: the logistic (Verhulst) growth curve of
  cumulative distinct customers by order month, linearized as
  ln(K/N_t - 1) = ln((K-N0)/N0) - r*t with fixed carrying capacity
  K = total customers + 1: one scalar ln per month point, OLS folds
  in month order, r = -slope and the inflection month t_mid =
  -intercept/slope.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave186 import rdd_side

US_PER_DAY = 86_400_000_000


def bass_fit(n_new: np.ndarray):
    """OLS of n_t on [1, N_{t-1}, N_{t-1}^2] for t = 1..T-1;
    returns (a, b, c, disc, m, p, q) with m/p/q None unless
    disc > 0 and c < 0. Moments are exact ints; Cramer in doubles."""
    N = np.concatenate(([0], np.cumsum(n_new))).astype(np.int64)
    x1 = N[:-1][1:]          # N_{t-1} for t >= 1
    y = n_new[1:]
    x2 = x1 * x1
    n = int(y.size)
    s1 = int(x1.sum())
    s2 = int(x2.sum())
    s11 = int((x1 * x1).sum())
    s12 = int((x1 * x2).sum())
    s22 = int((x2 * x2).sum())
    sy = int(y.sum())
    s1y = int((x1 * y).sum())
    s2y = int((x2 * y).sum())
    fn = float(n)
    f1, f2 = float(s1), float(s2)
    f11, f12, f22 = float(s11), float(s12), float(s22)
    fy, f1y, f2y = float(sy), float(s1y), float(s2y)
    if n == 0:
        return (None,) * 7
    det = (fn * (f11 * f22 - f12 * f12)
           - f1 * (f1 * f22 - f12 * f2)
           + f2 * (f1 * f12 - f11 * f2))
    if det == 0.0:
        # degenerate design (constant N): intercept-only fallback
        return sy / n, 0.0, 0.0, None, None, None, None
    da = (fy * (f11 * f22 - f12 * f12)
          - f1 * (f1y * f22 - f12 * f2y)
          + f2 * (f1y * f12 - f11 * f2y))
    db = (fn * (f1y * f22 - f12 * f2y)
          - fy * (f1 * f22 - f12 * f2)
          + f2 * (f1 * f2y - f1y * f2))
    dc = (fn * (f11 * f2y - f1y * f12)
          - f1 * (f1 * f2y - f1y * f2)
          + fy * (f1 * f12 - f11 * f2))
    a = da / det
    b = db / det
    c = dc / det
    disc = b * b - 4.0e0 * a * c
    if disc > 0.0 and c < 0.0:
        m = (-b - math.sqrt(disc)) / (2.0e0 * c)
        p = a / m
        q = -c * m
    else:
        m = p = q = None
    return a, b, c, disc, m, p, q


# ------------------------------------------------- orders_bass_diffusion
def _bass_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            ck = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            tab = pa.table({"c": pa.array(ck.astype(np.int64)),
                            "m": pa.array(month)})
            g = tab.group_by("c").aggregate([("m", "min")])
            return pa.table({
                "c": g.column("c").cast(pa.int64()),
                "m": g.column("m_min").cast(pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("c").aggregate([("m", "min")])
            return pa.table({
                "c": g.column("c").cast(pa.int64()),
                "m": g.column("m_min").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        first = m["m"].to_numpy(np.int64)
        lo = int(first.min())
        hi = int(first.max())
        n_new = np.bincount((first - lo).astype(np.int64),
                            minlength=hi - lo + 1).astype(np.int64)
        a, b, c, disc, mm, p, qq = bass_fit(n_new)
        return pa.table({
            "coef_a": pa.array([a], type=pa.float64()),
            "coef_b": pa.array([b], type=pa.float64()),
            "coef_c": pa.array([c], type=pa.float64()),
            "market_m": pa.array([mm], type=pa.float64()),
            "bass_p": pa.array([p], type=pa.float64()),
            "bass_q": pa.array([qq], type=pa.float64()),
        })

    sql = """
    WITH fc AS (
        SELECT o_custkey,
               min((year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1)) AS m
        FROM orders GROUP BY o_custkey
    ),
    span AS (SELECT min(m) AS lo, max(m) AS hi FROM fc),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS mth
        FROM span
    ),
    monthly AS (
        SELECT g.mth, CAST(coalesce(c.cnt, 0) AS BIGINT) AS nw
        FROM grid g LEFT JOIN (
            SELECT m, count(*) AS cnt FROM fc GROUP BY m
        ) c ON g.mth = c.m
    ),
    cum AS (
        SELECT mth, nw,
               CAST(coalesce(sum(nw) OVER (ORDER BY mth
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS nprev
        FROM monthly
    ),
    pts AS (
        SELECT nw AS y, nprev AS x1, nprev * nprev AS x2
        FROM cum
        WHERE mth > (SELECT lo FROM span)
    ),
    mo AS (
        SELECT CAST(count(*) AS DOUBLE) AS fn,
               CAST(sum(x1) AS DOUBLE) AS f1,
               CAST(sum(x2) AS DOUBLE) AS f2,
               CAST(sum(x1 * x1) AS DOUBLE) AS f11,
               CAST(sum(x1 * x2) AS DOUBLE) AS f12,
               CAST(sum(x2 * x2) AS DOUBLE) AS f22,
               CAST(sum(y) AS DOUBLE) AS fy,
               CAST(sum(x1 * y) AS DOUBLE) AS f1y,
               CAST(sum(x2 * y) AS DOUBLE) AS f2y
        FROM pts
    ),
    dd AS (
        SELECT mo.*,
               fn * (f11 * f22 - f12 * f12)
               - f1 * (f1 * f22 - f12 * f2)
               + f2 * (f1 * f12 - f11 * f2) AS det
        FROM mo
    ),
    sol AS (
        SELECT
            CASE WHEN det = 0.0e0 THEN fy / fn ELSE
                (fy * (f11 * f22 - f12 * f12)
                 - f1 * (f1y * f22 - f12 * f2y)
                 + f2 * (f1y * f12 - f11 * f2y)) / det
            END AS a,
            CASE WHEN det = 0.0e0 THEN 0.0e0 ELSE
                (fn * (f1y * f22 - f12 * f2y)
                 - fy * (f1 * f22 - f12 * f2)
                 + f2 * (f1 * f2y - f1y * f2)) / det
            END AS b,
            CASE WHEN det = 0.0e0 THEN 0.0e0 ELSE
                (fn * (f11 * f2y - f1y * f12)
                 - f1 * (f1 * f2y - f1y * f2)
                 + fy * (f1 * f12 - f11 * f2)) / det
            END AS c,
            det
        FROM dd
    )
    SELECT a AS coef_a, b AS coef_b, c AS coef_c,
           CASE WHEN b * b - 4.0e0 * a * c > 0.0e0 AND c < 0.0e0
                THEN (-b - sqrt(b * b - 4.0e0 * a * c))
                     / (2.0e0 * c) END AS market_m,
           CASE WHEN b * b - 4.0e0 * a * c > 0.0e0 AND c < 0.0e0
                THEN a / ((-b - sqrt(b * b - 4.0e0 * a * c))
                          / (2.0e0 * c)) END AS bass_p,
           CASE WHEN b * b - 4.0e0 * a * c > 0.0e0 AND c < 0.0e0
                THEN -c * ((-b - sqrt(b * b - 4.0e0 * a * c))
                           / (2.0e0 * c)) END AS bass_q
    FROM sol
    """
    return q, sql


# ---------------------------------------------- orders_logistic_growth
def _logistic_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            ck = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            od = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            tab = pa.table({"c": pa.array(ck.astype(np.int64)),
                            "m": pa.array(month)})
            g = tab.group_by("c").aggregate([("m", "min")])
            return pa.table({
                "c": g.column("c").cast(pa.int64()),
                "m": g.column("m_min").cast(pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("c").aggregate([("m", "min")])
            return pa.table({
                "c": g.column("c").cast(pa.int64()),
                "m": g.column("m_min").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        mm = tree_reduce_tables(refs, merge).to_pandas()
        first = mm["m"].to_numpy(np.int64)
        total = int(first.size)
        k = total + 1
        lo = int(first.min())
        hi = int(first.max())
        nw = np.bincount((first - lo).astype(np.int64),
                         minlength=hi - lo + 1).astype(np.int64)
        N = np.cumsum(nw).astype(np.int64)
        xs = np.arange(N.size, dtype=np.int64)
        ys = np.array([math.log(k / int(v) - 1.0) for v in N])
        icept, slope = rdd_side(xs, ys)
        r = -slope
        t_mid = -icept / slope
        return pa.table({
            "k_capacity": pa.array([k], type=pa.int64()),
            "growth_r": pa.array([r], type=pa.float64()),
            "t_mid_months": pa.array([t_mid], type=pa.float64()),
        })

    sql = """
    WITH fc AS (
        SELECT o_custkey,
               min((year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1)) AS m
        FROM orders GROUP BY o_custkey
    ),
    kk AS (SELECT CAST(count(*) + 1 AS BIGINT) AS k FROM fc),
    span AS (SELECT min(m) AS lo, max(m) AS hi FROM fc),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS mth
        FROM span
    ),
    cum AS (
        SELECT g.mth - (SELECT lo FROM span) AS t,
               CAST(sum(coalesce(c.cnt, 0)) OVER (ORDER BY g.mth
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n
        FROM grid g LEFT JOIN (
            SELECT m, count(*) AS cnt FROM fc GROUP BY m
        ) c ON g.mth = c.m
    ),
    pts AS (
        SELECT t,
               ln(CAST((SELECT k FROM kk) AS DOUBLE)
                  / CAST(n AS DOUBLE) - 1.0e0) AS y
        FROM cum
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM pts),
    mu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(t AS DOUBLE) ORDER BY t)),
                   (p, v) -> p + v)
                   / CAST((SELECT c FROM nn) AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(y ORDER BY t)), (p, v) -> p + v)
                   / CAST((SELECT c FROM nn) AS DOUBLE) AS my
        FROM pts
    ),
    folds AS (
        SELECT mu.mx, mu.my,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(t AS DOUBLE) - mu.mx) * (y - mu.my)
                        ORDER BY t)), (p, v) -> p + v) AS sxy,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(t AS DOUBLE) - mu.mx)
                        * (CAST(t AS DOUBLE) - mu.mx)
                        ORDER BY t)), (p, v) -> p + v) AS sxx
        FROM pts CROSS JOIN mu GROUP BY mu.mx, mu.my
    )
    SELECT (SELECT k FROM kk) AS k_capacity,
           -(sxy / sxx) AS growth_r,
           -(my - (sxy / sxx) * mx) / (sxy / sxx) AS t_mid_months
    FROM folds
    """
    return q, sql


def build_wave189_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_bass_diffusion",) + _bass_query()))
    add(*(("orders_logistic_growth",) + _logistic_query()))
    return queries, oracles
