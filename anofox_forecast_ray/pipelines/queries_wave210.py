"""Wave-210 queries: Fisher's g periodicity test, GPD-POT fit.

Both over the zero-filled hourly count series:

- events_fisher_g: Fisher's g-test — THE significance test for a
  periodogram peak: ordinates I_k at Fourier frequencies k=1..m
  (m = (n-1)//2) from anchored scalar cos/sin folds, g = max I /
  sum I (argmax by I DESC, k ASC over identically computed
  doubles), and the leading-term p-value m(1-g)^{m-1}. To keep the
  transcendental count bounded the test uses the first 120 Fourier
  frequencies (documented cap; the diurnal peak is at k = n/24).
- events_gpd_pot: the peaks-over-threshold generalized-Pareto fit
  by probability-weighted moments (Hosking-Wallis): threshold u =
  the exact integer 90th-percentile order statistic (rank
  ceil(0.9 n)), exceedances y sorted ascending (exact ints),
  b0 = sum y / n, b1 = sum (i-1) y_(i) / (n (n-1)), and with
  a1 = E[X(1-F)] = b0 - b1: xi = 2 - b0/(2 b1 - b0),
  sigma = 2 b0 (b0 - b1)/(2 b1 - b0).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries_wave137 import _hourly_counts

FG_MAXK = 120


def fisher_g(x):
    """(k_peak, g, p1) over the first min(FG_MAXK, (n-1)//2)
    Fourier frequencies; folds in t order per k."""
    n = len(x)
    m = min(FG_MAXK, (n - 1) // 2)
    ords = []
    for k in range(1, m + 1):
        w = 2.0e0 * math.pi * k / n
        cr = 0.0
        ci = 0.0
        for t in range(n):
            cr = cr + x[t] * math.cos(w * t)
            ci = ci + x[t] * math.sin(w * t)
        ords.append(cr * cr + ci * ci)
    tot = 0.0
    for v in ords:
        tot = tot + v
    best = None
    for k, v in enumerate(ords, start=1):
        key = (v, -k)
        if best is None or key > best[0]:
            best = (key, k, v)
    g = best[2] / tot
    p1 = m * (1.0e0 - g) ** (m - 1)
    return best[1], g, p1


def gpd_pot(x):
    """(u, n_exc, xi, sigma) from the int series."""
    xs = sorted(int(v) for v in x)
    n = len(xs)
    r = (9 * n + 9) // 10  # ceil(0.9 n), positive-int division
    u = xs[r - 1]
    y = sorted(v - u for v in xs if v > u)
    ne = len(y)
    s0 = 0
    s1 = 0
    for i, v in enumerate(y, start=1):
        s0 += v
        s1 += (i - 1) * v
    b0 = s0 / ne
    b1 = s1 / (ne * (ne - 1))
    # Hosking-Wallis use a1 = E[X(1-F)] = b0 - b1
    xi = 2.0e0 - b0 / (2.0e0 * b1 - b0)
    sigma = 2.0e0 * b0 * (b0 - b1) / (2.0e0 * b1 - b0)
    return u, ne, xi, sigma


# ------------------------------------------------------ events_fisher_g
def _fisher_g_query():
    def q(sf_dir: str):
        x = [int(v) for v in _hourly_counts(sf_dir)]
        k, g, p1 = fisher_g(x)
        return pa.table({
            "k_peak": pa.array([k], type=pa.int64()),
            "fisher_g": pa.array([g], type=pa.float64()),
            "p_first_term": pa.array([p1], type=pa.float64()),
        })

    US_PER_HOUR = 3_600_000_000
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour, COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list(CAST(cnt AS DOUBLE) ORDER BY hour) AS ys
        FROM grid
    ),
    ks AS (
        SELECT l.n, l.ys,
               CAST(unnest(generate_series(1,
                   CAST(least({FG_MAXK},
                        (l.n - 1) // 2) AS INTEGER)))
                   AS BIGINT) AS k
        FROM l
    ),
    crci AS (
        SELECT k,
               list_reduce(list_prepend(0.0e0,
                    list_transform(generate_series(1,
                        CAST(n AS INTEGER)),
                        i -> ys[i] * cos(2.0e0 * pi()
                             * CAST(k AS DOUBLE)
                             / CAST(n AS DOUBLE)
                             * CAST(i - 1 AS DOUBLE)))),
                    (p, v) -> p + v) AS cr,
               list_reduce(list_prepend(0.0e0,
                    list_transform(generate_series(1,
                        CAST(n AS INTEGER)),
                        i -> ys[i] * sin(2.0e0 * pi()
                             * CAST(k AS DOUBLE)
                             / CAST(n AS DOUBLE)
                             * CAST(i - 1 AS DOUBLE)))),
                    (p, v) -> p + v) AS ci
        FROM ks
    ),
    ords AS (
        SELECT k, cr * cr + ci * ci AS io FROM crci
    ),
    tot AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(io ORDER BY k)), (p, v) -> p + v) AS s,
               CAST(max(k) AS BIGINT) AS m
        FROM ords
    ),
    pick AS (
        SELECT k, io,
               row_number() OVER (ORDER BY io DESC, k ASC)
                   AS rk
        FROM ords
    )
    SELECT pick.k AS k_peak,
           pick.io / tot.s AS fisher_g,
           CAST(tot.m AS DOUBLE)
               * power(1.0e0 - pick.io / tot.s,
                       CAST(tot.m - 1 AS DOUBLE))
               AS p_first_term
    FROM pick CROSS JOIN tot WHERE pick.rk = 1
    """
    return q, sql


# ------------------------------------------------------- events_gpd_pot
def _gpd_query():
    def q(sf_dir: str):
        x = [int(v) for v in _hourly_counts(sf_dir)]
        u, ne, xi, sigma = gpd_pot(x)
        return pa.table({
            "threshold_u": pa.array([u], type=pa.int64()),
            "n_exceed": pa.array([ne], type=pa.int64()),
            "gpd_xi": pa.array([xi], type=pa.float64()),
            "gpd_sigma": pa.array([sigma], type=pa.float64()),
        })

    US_PER_HOUR = 3_600_000_000
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
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt) AS r
        FROM grid
    ),
    thr AS (
        SELECT cnt AS u FROM ranked
        WHERE r = (9 * (SELECT n FROM nn) + 9) // 10
    ),
    exc AS (
        SELECT cnt - (SELECT u FROM thr) AS y,
               row_number() OVER (ORDER BY cnt) AS i
        FROM grid WHERE cnt > (SELECT u FROM thr)
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS ne,
               CAST(sum(y) AS BIGINT) AS s0,
               CAST(sum((i - 1) * y) AS BIGINT) AS s1
        FROM exc
    ),
    b AS (
        SELECT ne,
               CAST(s0 AS DOUBLE) / CAST(ne AS DOUBLE) AS b0,
               CAST(s1 AS DOUBLE)
                   / CAST(ne * (ne - 1) AS DOUBLE) AS b1
        FROM s
    )
    SELECT (SELECT u FROM thr) AS threshold_u,
           ne AS n_exceed,
           2.0e0 - b0 / (2.0e0 * b1 - b0) AS gpd_xi,
           2.0e0 * b0 * (b0 - b1) / (2.0e0 * b1 - b0)
               AS gpd_sigma
    FROM b
    """
    return q, sql


def build_wave210_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_fisher_g",) + _fisher_g_query()))
    add(*(("events_gpd_pot",) + _gpd_query()))
    return queries, oracles
