"""Wave-280 query: Cramér-Lundberg adjustment coefficient.

events_lundberg_adjustment: the discrete-time ruin-theory adjustment
coefficient R for the daily error "claims" process under a 10%
safety loading — the unique positive root of
f(R) = mean(exp(R·(x−c))) − 1 with premium c = 1.1·mean(x).
The bracket top is data-driven (R_max = ln(n+1)/(x_max − c) forces
f > 0 by the max term alone), and FORTY bisection steps replay
bitwise on both sides (the 7th replayed iteration loop; each step
is one day-ordered exp fold, SQL layers MATERIALIZED).  Emits R and
the Lundberg ruin bound exp(−R·u) at buffer u = 10·c.
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

N_BISECT = 40


def lundberg(x):
    """(c, r, ruin_bound) — 40 bisection steps on the MGF root."""
    n = len(x)
    fn = float(n)
    c = 1.1 * (float(sum(x)) / fn)
    xmax = max(x)
    hi = math.log(fn + 1.0) / (float(xmax) - c)
    lo = 0.0
    for _ in range(N_BISECT):
        mid = (lo + hi) / 2.0
        s = 0.0
        for v in x:                       # day order
            s = s + math.exp(mid * (float(v) - c))
        f = s / fn - 1.0
        if f > 0.0:
            hi = mid
        else:
            lo = mid
    r = (lo + hi) / 2.0
    u = 10.0 * c
    return c, r, math.exp(-(r * u))


def _lundberg_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        c, r, bound = lundberg([int(v) for v in e])
        return pa.table({
            "premium": pa.array([c], type=pa.float64()),
            "adjustment_r": pa.array([r], type=pa.float64()),
            "ruin_bound": pa.array([bound], type=pa.float64()),
        })

    layers = []
    for t in range(1, N_BISECT + 1):
        layers.append(f"""
    b{t} AS MATERIALIZED (
        SELECT CASE WHEN (SELECT list_reduce(list_prepend(0.0e0,
                        list(exp(((b{t - 1}.lo + b{t - 1}.hi)
                                  / 2.0e0)
                                 * (CAST(d.y AS DOUBLE)
                                    - (SELECT c FROM cc)))
                             ORDER BY d.i))
                    , (a, b) -> a + b) FROM d)
                    / (SELECT fn FROM cc) - 1.0e0 > 0.0e0
                    THEN b{t - 1}.lo
                    ELSE (b{t - 1}.lo + b{t - 1}.hi) / 2.0e0
               END AS lo,
               CASE WHEN (SELECT list_reduce(list_prepend(0.0e0,
                        list(exp(((b{t - 1}.lo + b{t - 1}.hi)
                                  / 2.0e0)
                                 * (CAST(d.y AS DOUBLE)
                                    - (SELECT c FROM cc)))
                             ORDER BY d.i))
                    , (a, b) -> a + b) FROM d)
                    / (SELECT fn FROM cc) - 1.0e0 > 0.0e0
                    THEN (b{t - 1}.lo + b{t - 1}.hi) / 2.0e0
                    ELSE b{t - 1}.hi
               END AS hi
        FROM b{t - 1}
    )""")
    layers_sql = ",".join(layers)

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS MATERIALIZED (
        SELECT g.day - (SELECT lo FROM span) AS i,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    cc AS MATERIALIZED (
        SELECT CAST(count(*) AS DOUBLE) AS fn,
               1.1e0 * (CAST(sum(y) AS DOUBLE)
                        / CAST(count(*) AS DOUBLE)) AS c,
               CAST(max(y) AS BIGINT) AS xmax
        FROM d
    ),
    b0 AS MATERIALIZED (
        SELECT 0.0e0 AS lo,
               ln(cc.fn + 1.0e0)
                   / (CAST(cc.xmax AS DOUBLE) - cc.c) AS hi
        FROM cc
    ),{layers_sql}
    SELECT cc.c AS premium,
           (b{N_BISECT}.lo + b{N_BISECT}.hi) / 2.0e0
               AS adjustment_r,
           exp(-(((b{N_BISECT}.lo + b{N_BISECT}.hi) / 2.0e0)
                 * (10.0e0 * cc.c))) AS ruin_bound
    FROM b{N_BISECT} CROSS JOIN cc
    """
    return q, sql


def build_wave280_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_lundberg_adjustment",) + _lundberg_query()))
    return queries, oracles
