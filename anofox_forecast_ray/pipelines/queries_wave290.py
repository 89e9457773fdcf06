"""Wave-290 query: Mantel distance-matrix correlation.

events_mantel: the Mantel (1967) test applied temporally — the
Pearson correlation between the day-distance matrix (j − i) and the
error-count distance matrix |y_i − y_j| over all C(n,2) day pairs.
Both distances are exact integers, so the correlation is the raw
integer-moment formula with one sqrt (full-spread counts — the
cancellation-safe case per the NOTES rule).  Positive r ⇔ nearby
days have similar error counts (distance-matrix autocorrelation) —
the matrix-form companion of the ACF and variogram rows.
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000


def mantel(y):
    """(m_pairs, r) over all day pairs."""
    n = len(y)
    m = sx = sy = sxx = syy = sxy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dt = j - i
            dx = abs(y[i] - y[j])
            m += 1
            sx += dt
            sy += dx
            sxx += dt * dt
            syy += dx * dx
            sxy += dt * dx
    fm = float(m)
    num = fm * float(sxy) - float(sx) * float(sy)
    den = math.sqrt((fm * float(sxx) - float(sx) * float(sx))
                    * (fm * float(syy)
                       - float(sy) * float(sy)))
    return m, num / den


def _mantel_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        m, r = mantel([int(v) for v in e])
        return pa.table({
            "n_pairs": pa.array([m], type=pa.int64()),
            "mantel_r": pa.array([r], type=pa.float64()),
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
        SELECT g.day - (SELECT lo FROM span) AS i,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    prs AS (
        SELECT b.i - a.i AS dt, abs(a.y - b.y) AS dx
        FROM d a JOIN d b ON b.i > a.i
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(dt) AS BIGINT) AS sx,
               CAST(sum(dx) AS BIGINT) AS sy,
               CAST(sum(dt * dt) AS BIGINT) AS sxx,
               CAST(sum(dx * dx) AS BIGINT) AS syy,
               CAST(sum(dt * dx) AS BIGINT) AS sxy
        FROM prs
    )
    SELECT m AS n_pairs,
           (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE))) AS mantel_r
    FROM s
    """
    return q, sql


def build_wave290_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_mantel",) + _mantel_query()))
    return queries, oracles
