"""Wave-243 queries: forecast-evaluation classics over daily errors.

events_diebold_mariano: Diebold-Mariano (1995) equal-predictive-
accuracy test comparing one-step naive (lag-1) vs seasonal-naive
(lag-7) forecasts of the daily error count under squared-error loss.
The loss differential d_t = (y_t - y_{t-1})^2 - (y_t - y_{t-7})^2 is
an exact integer, so Sd and Sdd fold exactly; the DM statistic and
Harvey-Leybourne-Newbold small-sample correction (h=1) are spelled as
the identical float expression on both sides.

events_pesaran_timmermann: Pesaran-Timmermann (1992) directional-
accuracy test of the seasonal-naive forecast — does sign(y_{t-7} -
y_{t-1}) predict sign(y_t - y_{t-1})?  All inputs are four integer
counts (n, actual-ups, predicted-ups, correct); the PT statistic is
the textbook variance decomposition evaluated identically on both
sides.

Both are new oracle rows for the forecast-metrics family
(kernels/metrics.py; ref src/metrics/ forecast accuracy layer).
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

_GRID_CTE = f"""
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
        SELECT day, y,
               lag(y, 1) OVER (ORDER BY day) AS y1,
               lag(y, 7) OVER (ORDER BY day) AS y7
        FROM d
    ),
    pairs AS (
        SELECT y, y1, y7 FROM lagged WHERE y7 IS NOT NULL
    )
"""


def dm_stat(y):
    """(n, dbar, dm, dm_harvey) for naive-vs-snaive squared loss."""
    d = [(y[t] - y[t - 1]) ** 2 - (y[t] - y[t - 7]) ** 2
         for t in range(7, len(y))]
    n = len(d)
    sd = sum(d)
    sdd = sum(v * v for v in d)
    fm = float(n)
    dbar = float(sd) / fm
    dm = dbar / math.sqrt(
        (fm * float(sdd) - float(sd) * float(sd))
        / (fm * fm * (fm - 1.0)))
    harvey = dm * math.sqrt((fm - 1.0) / fm)
    return n, dbar, dm, harvey


def pt_stat(y):
    """(n, hit_rate, pt) for snaive directional accuracy vs naive."""
    n = ny = nx = nc = 0
    for t in range(7, len(y)):
        au = 1 if y[t] - y[t - 1] > 0 else 0
        pu = 1 if y[t - 7] - y[t - 1] > 0 else 0
        n += 1
        ny += au
        nx += pu
        nc += 1 if au == pu else 0
    fm = float(n)
    p = float(nc) / fm
    py = float(ny) / fm
    px = float(nx) / fm
    ps = py * px + (1.0 - py) * (1.0 - px)
    vp = ps * (1.0 - ps) / fm
    vps = ((2.0 * py - 1.0) * (2.0 * py - 1.0)
           * px * (1.0 - px)
           + (2.0 * px - 1.0) * (2.0 * px - 1.0)
           * py * (1.0 - py)
           + 4.0 * py * px * (1.0 - py) * (1.0 - px) / fm) / fm
    pt = (p - ps) / math.sqrt(vp - vps)
    return n, p, pt


# -------------------------------------------- events_diebold_mariano
def _dm_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, dbar, dm, harvey = dm_stat([int(v) for v in e])
        return pa.table({
            "n_obs": pa.array([n], type=pa.int64()),
            "mean_loss_diff": pa.array([dbar], type=pa.float64()),
            "dm_stat": pa.array([dm], type=pa.float64()),
            "dm_harvey": pa.array([harvey], type=pa.float64()),
        })

    sql = _GRID_CTE + """,
    loss AS (
        SELECT (y - y1) * (y - y1) - (y - y7) * (y - y7) AS ld
        FROM pairs
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(ld) AS BIGINT) AS sd,
               CAST(sum(ld * ld) AS BIGINT) AS sdd
        FROM loss
    )
    SELECT n AS n_obs,
           CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS mean_loss_diff,
           (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * (CAST(n AS DOUBLE) - 1))) AS dm_stat,
           ((CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                    - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * (CAST(n AS DOUBLE) - 1))))
           * sqrt((CAST(n AS DOUBLE) - 1) / CAST(n AS DOUBLE))
               AS dm_harvey
    FROM s
    """
    return q, sql


# ---------------------------------------- events_pesaran_timmermann
def _pt_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, p, pt = pt_stat([int(v) for v in e])
        return pa.table({
            "n_obs": pa.array([n], type=pa.int64()),
            "hit_rate": pa.array([p], type=pa.float64()),
            "pt_stat": pa.array([pt], type=pa.float64()),
        })

    sql = _GRID_CTE + """,
    dirs AS (
        SELECT CASE WHEN y - y1 > 0 THEN 1 ELSE 0 END AS au,
               CASE WHEN y7 - y1 > 0 THEN 1 ELSE 0 END AS pu
        FROM pairs
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(au) AS BIGINT) AS ny,
               CAST(sum(pu) AS BIGINT) AS nx,
               CAST(sum(CASE WHEN au = pu THEN 1 ELSE 0 END)
                    AS BIGINT) AS nc
        FROM dirs
    ),
    f AS (
        SELECT n,
               CAST(nc AS DOUBLE) / CAST(n AS DOUBLE) AS p,
               CAST(ny AS DOUBLE) / CAST(n AS DOUBLE) AS py,
               CAST(nx AS DOUBLE) / CAST(n AS DOUBLE) AS px,
               CAST(n AS DOUBLE) AS fm
        FROM s
    ),
    g AS (
        SELECT n, p, py, px, fm,
               py * px + (1.0 - py) * (1.0 - px) AS ps
        FROM f
    )
    SELECT n AS n_obs,
           p AS hit_rate,
           (p - ps)
           / sqrt(ps * (1.0 - ps) / fm
                  - (((2.0 * py - 1.0) * (2.0 * py - 1.0)
                      * px * (1.0 - px)
                      + (2.0 * px - 1.0) * (2.0 * px - 1.0)
                      * py * (1.0 - py)
                      + 4.0 * py * px * (1.0 - py) * (1.0 - px)
                        / fm) / fm)) AS pt_stat
    FROM g
    """
    return q, sql


def build_wave243_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_diebold_mariano",) + _dm_query()))
    add(*(("events_pesaran_timmermann",) + _pt_query()))
    return queries, oracles
