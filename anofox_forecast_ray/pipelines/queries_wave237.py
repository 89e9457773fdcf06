"""Wave-237 query: GPH long-memory estimator.

events_gph_d: the Geweke-Porter-Hudak estimator of the fractional
integration order d of the hourly count series — the long-memory
companion of the R/S, DFA and variance-time Hurst views: OLS of
ln I(lambda_j) on ln(4 sin^2(lambda_j/2)) over the first m = 12
Fourier frequencies, d = -slope. Periodogram ordinates reuse the
wave-210 anchored cos/sin fold discipline (cr/ci materialized
once per frequency); the regressor is one sin per j; OLS folds in
j order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries_wave137 import _hourly_counts

GPH_M = 12


def gph_d(x, m: int = GPH_M):
    """(d_hat, n_freq) via log-periodogram regression."""
    n = len(x)
    xs = []
    ys = []
    for j in range(1, m + 1):
        w = 2.0e0 * math.pi * j / n
        cr = 0.0
        ci = 0.0
        for t in range(n):
            cr = cr + x[t] * math.cos(w * t)
            ci = ci + x[t] * math.sin(w * t)
        io = cr * cr + ci * ci
        s = math.sin(w / 2.0e0)
        xs.append(math.log(4.0e0 * (s * s)))
        ys.append(math.log(io))
    sx = 0.0
    sy = 0.0
    for v in xs:
        sx = sx + v
    for v in ys:
        sy = sy + v
    mx = sx / m
    my = sy / m
    sxy = 0.0
    sxx = 0.0
    for a, b in zip(xs, ys):
        sxy = sxy + (a - mx) * (b - my)
        sxx = sxx + (a - mx) * (a - mx)
    return -(sxy / sxx), m


# ----------------------------------------------------- events_gph_d
def _gph_query():
    def q(sf_dir: str):
        x = [int(v) for v in _hourly_counts(sf_dir)]
        d, m = gph_d(x)
        return pa.table({
            "n_freq": pa.array([m], type=pa.int64()),
            "gph_d": pa.array([d], type=pa.float64()),
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
               CAST(unnest(generate_series(1, {GPH_M}))
                   AS BIGINT) AS j
        FROM l
    ),
    crci AS (
        SELECT j, n,
               list_reduce(list_prepend(0.0e0,
                    list_transform(generate_series(1,
                        CAST(n AS INTEGER)),
                        i -> ys[i] * cos(2.0e0 * pi()
                             * CAST(j AS DOUBLE)
                             / CAST(n AS DOUBLE)
                             * CAST(i - 1 AS DOUBLE)))),
                    (p, v) -> p + v) AS cr,
               list_reduce(list_prepend(0.0e0,
                    list_transform(generate_series(1,
                        CAST(n AS INTEGER)),
                        i -> ys[i] * sin(2.0e0 * pi()
                             * CAST(j AS DOUBLE)
                             / CAST(n AS DOUBLE)
                             * CAST(i - 1 AS DOUBLE)))),
                    (p, v) -> p + v) AS ci
        FROM ks
    ),
    pts AS (
        SELECT j,
               ln(4.0e0 * (sin(2.0e0 * pi()
                   * CAST(j AS DOUBLE) / CAST(n AS DOUBLE)
                   / 2.0e0)
                   * sin(2.0e0 * pi() * CAST(j AS DOUBLE)
                         / CAST(n AS DOUBLE) / 2.0e0))) AS lx,
               ln(cr * cr + ci * ci) AS ly
        FROM crci
    ),
    mu AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(lx ORDER BY j)), (p, v) -> p + v)
                   / {GPH_M}.0e0 AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(ly ORDER BY j)), (p, v) -> p + v)
                   / {GPH_M}.0e0 AS my
        FROM pts
    ),
    sl AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((lx - mu.mx) * (ly - mu.my) ORDER BY j)),
                (p, v) -> p + v)
            / list_reduce(list_prepend(0.0e0,
                list((lx - mu.mx) * (lx - mu.mx) ORDER BY j)),
                (p, v) -> p + v) AS slope
        FROM pts CROSS JOIN mu GROUP BY mu.mx, mu.my
    )
    SELECT CAST({GPH_M} AS BIGINT) AS n_freq,
           -slope AS gph_d
    FROM sl
    """
    return q, sql


def build_wave237_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_gph_d",) + _gph_query()))
    return queries, oracles
