"""Wave-250 queries: forecast combination over the daily error series.

events_bates_granger: Bates-Granger (1969) optimal combination weight
for the naive (lag-1) vs seasonal-naive (lag-7) one-step forecasts,
w* = (S22 − S12)/(S11 + S22 − 2·S12) from the uncentered error
moments — all exact integers — plus the per-obs MSEs and the combined
MSE at w*, which must undercut both components (verified property).

events_forecast_encompassing: the Harvey-Leybourne-Newbold (1998)
encompassing regression e1 = λ(e1 − e2) + u through the origin.
λ = S1d/Sdd and its t statistic from RSS/(n−1)/Sdd — four integer
sums, three float expressions spelled identically on both sides.
λ near 0 ⇒ forecast 1 encompasses forecast 2; λ near 1 ⇒ the
reverse.  Completes the DM / Pesaran-Timmermann / Mincer-Zarnowitz
forecast-evaluation suite (waves 243/247).
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

_PAIR_CTE = f"""
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
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    lagged AS (
        SELECT y,
               y - lag(y, 1) OVER (ORDER BY day) AS e1,
               y - lag(y, 7) OVER (ORDER BY day) AS e2
        FROM d
    ),
    pairs AS (
        SELECT e1, e2 FROM lagged WHERE e2 IS NOT NULL
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(e1 * e1) AS BIGINT) AS s11,
               CAST(sum(e2 * e2) AS BIGINT) AS s22,
               CAST(sum(e1 * e2) AS BIGINT) AS s12,
               CAST(sum((e1 - e2) * (e1 - e2)) AS BIGINT) AS sdd,
               CAST(sum(e1 * (e1 - e2)) AS BIGINT) AS s1d
        FROM pairs
    )
"""


def error_moments(y):
    """(n, s11, s22, s12, sdd, s1d) integer moments of lag-1/lag-7
    one-step errors."""
    e1 = [y[t] - y[t - 1] for t in range(7, len(y))]
    e2 = [y[t] - y[t - 7] for t in range(7, len(y))]
    n = len(e1)
    s11 = sum(a * a for a in e1)
    s22 = sum(b * b for b in e2)
    s12 = sum(a * b for a, b in zip(e1, e2))
    sdd = sum((a - b) * (a - b) for a, b in zip(e1, e2))
    s1d = sum(a * (a - b) for a, b in zip(e1, e2))
    return n, s11, s22, s12, sdd, s1d


def bates_granger(y):
    """(n, w, mse1, mse2, mse_combo)."""
    n, s11, s22, s12, sdd, _ = error_moments(y)
    fn = float(n)
    w = float(s22 - s12) / float(s11 + s22 - 2 * s12)
    mse1 = float(s11) / fn
    mse2 = float(s22) / fn
    mse_c = (w * w * float(s11)
             + 2.0 * w * (1.0 - w) * float(s12)
             + (1.0 - w) * (1.0 - w) * float(s22)) / fn
    return n, w, mse1, mse2, mse_c


def forecast_encompassing(y):
    """(n, lambda, t_stat) for e1 = lambda (e1 - e2) + u."""
    n, s11, _, _, sdd, s1d = error_moments(y)
    fn = float(n)
    lam = float(s1d) / float(sdd)
    rss = (float(s11) - 2.0 * lam * float(s1d)
           + lam * lam * float(sdd))
    t = lam / math.sqrt(rss / ((fn - 1.0) * float(sdd)))
    return n, lam, t


# --------------------------------------------- events_bates_granger
def _bg_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, w, mse1, mse2, mse_c = bates_granger([int(v) for v in e])
        return pa.table({
            "n_obs": pa.array([n], type=pa.int64()),
            "bg_weight": pa.array([w], type=pa.float64()),
            "mse_naive": pa.array([mse1], type=pa.float64()),
            "mse_snaive": pa.array([mse2], type=pa.float64()),
            "mse_combo": pa.array([mse_c], type=pa.float64()),
        })

    sql = _PAIR_CTE + """,
    f AS (
        SELECT n, CAST(n AS DOUBLE) AS fn,
               CAST(s22 - s12 AS DOUBLE)
                   / CAST(s11 + s22 - 2 * s12 AS DOUBLE) AS w,
               CAST(s11 AS DOUBLE) AS f11,
               CAST(s22 AS DOUBLE) AS f22,
               CAST(s12 AS DOUBLE) AS f12
        FROM s
    )
    SELECT n AS n_obs,
           w AS bg_weight,
           f11 / fn AS mse_naive,
           f22 / fn AS mse_snaive,
           (w * w * f11 + 2.0 * w * (1.0 - w) * f12
            + (1.0 - w) * (1.0 - w) * f22) / fn AS mse_combo
    FROM f
    """
    return q, sql


# -------------------------------------- events_forecast_encompassing
def _enc_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, lam, t = forecast_encompassing([int(v) for v in e])
        return pa.table({
            "n_obs": pa.array([n], type=pa.int64()),
            "lambda": pa.array([lam], type=pa.float64()),
            "t_stat": pa.array([t], type=pa.float64()),
        })

    sql = _PAIR_CTE + """,
    f AS (
        SELECT n, CAST(n AS DOUBLE) AS fn,
               CAST(s1d AS DOUBLE) / CAST(sdd AS DOUBLE) AS lam,
               CAST(s11 AS DOUBLE) AS f11,
               CAST(s1d AS DOUBLE) AS f1d,
               CAST(sdd AS DOUBLE) AS fdd
        FROM s
    )
    SELECT n AS n_obs,
           lam AS lambda,
           lam / sqrt((f11 - 2.0 * lam * f1d + lam * lam * fdd)
                      / ((fn - 1.0) * fdd)) AS t_stat
    FROM f
    """
    return q, sql


def build_wave250_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_bates_granger",) + _bg_query()))
    add(*(("events_forecast_encompassing",) + _enc_query()))
    return queries, oracles
