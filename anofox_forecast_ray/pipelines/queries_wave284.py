"""Wave-284 query: instantaneous reproduction number R_t.

events_epi_rt: the Cori et al. (2013) EpiEstim instantaneous
reproduction number of the daily error "incidence":
R_t = I_t / Σ_s w_s·I_{t−s} with the fixed DYADIC serial-interval
kernel w = (1/4, 1/2, 1/8, 1/8), so the denominator is the exact
integer 8Λ_t = 2I_{t−1} + 4I_{t−2} + I_{t−3} + I_{t−4} and every
R_t = 8·I_t / (8Λ_t) is a single float division of integers.  Emits
the number of scored days, mean R (t-ordered fold), the max R_t with
its day (float argmax over identical values, ties → earliest), and
the final R.  R ≈ 1 ⇔ the error process is self-sustaining at its
current level.
"""

from __future__ import annotations

import pyarrow as pa

US_PER_DAY = 86_400_000_000


def epi_rt(x):
    """(n_scored, mean_r, max_r, argmax_day, last_r)."""
    rs = []
    for t in range(4, len(x)):
        lam8 = (2 * x[t - 1] + 4 * x[t - 2] + x[t - 3]
                + x[t - 4])
        rs.append((t, float(8 * x[t]) / float(lam8)))
    s = 0.0
    for _, r in rs:
        s = s + r
    best = None
    for t, r in rs:              # ascending t: first max
        if best is None or r > best[1]:
            best = (t, r)
    return (len(rs), s / float(len(rs)), best[1], best[0],
            rs[-1][1])


def _rt_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, mean_r, max_r, arg, last_r = epi_rt(
            [int(v) for v in e])
        return pa.table({
            "n_scored": pa.array([n], type=pa.int64()),
            "mean_r": pa.array([mean_r], type=pa.float64()),
            "max_r": pa.array([max_r], type=pa.float64()),
            "argmax_day": pa.array([arg], type=pa.int64()),
            "last_r": pa.array([last_r], type=pa.float64()),
        })

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
    d AS (
        SELECT g.day - (SELECT lo FROM span) AS t,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    lagged AS (
        SELECT t, y,
               2 * lag(y, 1) OVER (ORDER BY t)
               + 4 * lag(y, 2) OVER (ORDER BY t)
               + lag(y, 3) OVER (ORDER BY t)
               + lag(y, 4) OVER (ORDER BY t) AS lam8,
               lag(y, 4) OVER (ORDER BY t) AS guard
        FROM d
    ),
    rt AS (
        SELECT t,
               CAST(8 * y AS DOUBLE) / CAST(lam8 AS DOUBLE) AS r
        FROM lagged WHERE guard IS NOT NULL
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list_reduce(list_prepend(0.0e0,
                   list(r ORDER BY t)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS mean_r
        FROM rt
    ),
    mx AS (
        SELECT t, r FROM rt ORDER BY r DESC, t ASC LIMIT 1
    ),
    lst AS (
        SELECT r FROM rt ORDER BY t DESC LIMIT 1
    )
    SELECT agg.n AS n_scored,
           agg.mean_r,
           mx.r AS max_r,
           mx.t AS argmax_day,
           (SELECT r FROM lst) AS last_r
    FROM agg CROSS JOIN mx
    """
    return q, sql


def build_wave284_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_epi_rt",) + _rt_query()))
    return queries, oracles
