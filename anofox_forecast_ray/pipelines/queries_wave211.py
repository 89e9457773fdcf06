"""Wave-211 queries: variance-time Hurst, Tukey fences.

- events_variance_time_hurst: the AGGREGATED-VARIANCE estimator of
  the Hurst exponent (the third classical LRD estimator next to
  R/S and DFA): for block sizes m in {1,2,4,8,16}, the variance of
  m-block means of the hourly count series falls as m^(2H-2); H =
  1 + slope/2 from OLS of ln var_m on ln m. Block sums are exact
  ints (full blocks only), each var_m is the explicit moment
  formula divided by m^2, and the 5-point OLS folds in m order.
- customer_acctbal_tukey: the boxplot rule — Tukey fences at
  Q1 - 1.5 IQR and Q3 + 1.5 IQR over account-balance cents.
  Quartiles use quantile_cont at quarter fractions on exact ints
  (the NOTES-proven np.quantile == DuckDB equivalence); outlier
  counts are integer comparisons against identically-computed
  fences.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave137 import _hourly_counts

VT_MS = (1, 2, 4, 8, 16)


def variance_time(x):
    """[(m, K, var_m)] for the block sizes; exact int moments."""
    out = []
    n = len(x)
    for m in VT_MS:
        K = n // m
        s1 = 0
        s2 = 0
        for b in range(K):
            tot = 0
            for j in range(m):
                tot += int(x[b * m + j])
            s1 += tot
            s2 += tot * tot
        var_sum = (float(s2) - float(s1) * float(s1) / K) \
            / (K - 1)
        out.append((m, K, var_sum / (m * m)))
    return out


def vt_hurst(x):
    rows = variance_time(x)
    xs = [math.log(float(m)) for m, _, _ in rows]
    ys = [math.log(v) for _, _, v in rows]
    n = len(xs)
    sx = 0.0
    sy = 0.0
    for v in xs:
        sx = sx + v
    for v in ys:
        sy = sy + v
    mx = sx / n
    my = sy / n
    sxy = 0.0
    sxx = 0.0
    for a, b in zip(xs, ys):
        sxy = sxy + (a - mx) * (b - my)
        sxx = sxx + (a - mx) * (a - mx)
    slope = sxy / sxx
    return slope, 1.0e0 + slope / 2.0e0


# -------------------------------------------- events_variance_time_hurst
def _vt_query():
    def q(sf_dir: str):
        x = [int(v) for v in _hourly_counts(sf_dir)]
        slope, h = vt_hurst(x)
        return pa.table({
            "vt_slope": pa.array([slope], type=pa.float64()),
            "hurst_h": pa.array([h], type=pa.float64()),
        })

    US_PER_HOUR = 3_600_000_000
    per_m = " UNION ALL ".join(f"""
        SELECT {m} AS m, CAST(count(*) AS BIGINT) AS kk,
               CAST(sum(bs) AS BIGINT) AS s1,
               CAST(sum(bs * bs) AS BIGINT) AS s2
        FROM (
            SELECT CAST(sum(cnt) AS BIGINT) AS bs,
                   count(*) AS csize
            FROM grid
            GROUP BY (hour - (SELECT min(hour) FROM grid))
                     // {m}
            HAVING count(*) = {m}
        )""" for m in VT_MS)

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour,
               CAST(COALESCE(hc.cnt, 0) AS BIGINT) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    per_m AS ({per_m}),
    vt AS (
        SELECT m,
               ln(CAST(m AS DOUBLE)) AS lx,
               ln(((CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                      / CAST(kk AS DOUBLE))
                   / CAST(kk - 1 AS DOUBLE))
                  / CAST(m * m AS DOUBLE)) AS ly
        FROM per_m
    ),
    mu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(lx ORDER BY m)), (p, v) -> p + v)
                   / {len(VT_MS)}.0e0 AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(ly ORDER BY m)), (p, v) -> p + v)
                   / {len(VT_MS)}.0e0 AS my
        FROM vt
    ),
    sl AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((lx - mu.mx) * (ly - mu.my) ORDER BY m)),
                (p, v) -> p + v)
            / list_reduce(list_prepend(0.0e0,
                list((lx - mu.mx) * (lx - mu.mx) ORDER BY m)),
                (p, v) -> p + v) AS slope
        FROM vt CROSS JOIN mu GROUP BY mu.mx, mu.my
    )
    SELECT slope AS vt_slope,
           1.0e0 + slope / 2.0e0 AS hurst_h
    FROM sl
    """
    return q, sql


# ---------------------------------------------- customer_acctbal_tukey
def _tukey_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            cents = np.round(t.column("c_acctbal").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            uk, c = np.unique(cents, return_counts=True)
            return pa.table({
                "v": pa.array(uk),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("v").aggregate([("c", "sum")])
            return pa.table({
                "v": g.column("v").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "customer", ["c_acctbal"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("v").reset_index(drop=True)
        vals = np.repeat(h["v"].to_numpy(np.int64),
                         h["c"].to_numpy(np.int64))
        q1 = float(np.quantile(vals, 0.25))
        q3 = float(np.quantile(vals, 0.75))
        iqr = q3 - q1
        lo = q1 - 1.5e0 * iqr
        hi = q3 + 1.5e0 * iqr
        n_low = int((vals < lo).sum())
        n_high = int((vals > hi).sum())
        return pa.table({
            "q1_cents": pa.array([q1], type=pa.float64()),
            "q3_cents": pa.array([q3], type=pa.float64()),
            "n_low": pa.array([n_low], type=pa.int64()),
            "n_high": pa.array([n_high], type=pa.int64()),
        })

    sql = """
    WITH c AS (
        SELECT CAST(round_even(c_acctbal * 100, 0) AS BIGINT)
                   AS v
        FROM customer
    ),
    qq AS (
        SELECT quantile_cont(v, 0.25) AS q1,
               quantile_cont(v, 0.75) AS q3
        FROM c
    )
    SELECT qq.q1 AS q1_cents, qq.q3 AS q3_cents,
           (SELECT CAST(sum(CASE WHEN CAST(v AS DOUBLE)
                 < qq.q1 - 1.5e0 * (qq.q3 - qq.q1)
                THEN 1 ELSE 0 END) AS BIGINT) FROM c)
               AS n_low,
           (SELECT CAST(sum(CASE WHEN CAST(v AS DOUBLE)
                 > qq.q3 + 1.5e0 * (qq.q3 - qq.q1)
                THEN 1 ELSE 0 END) AS BIGINT) FROM c)
               AS n_high
    FROM qq
    """
    return q, sql


def build_wave211_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_variance_time_hurst",) + _vt_query()))
    add(*(("customer_acctbal_tukey",) + _tukey_query()))
    return queries, oracles
