"""Wave-288 query: single-component cosinor rhythm analysis.

events_cosinor: the chronobiology classic — harmonic regression of
the dense hourly count series on cos/sin at the 24 h period:
MESOR = mean, a = (2/n)Σy·cosωt, b = (2/n)Σy·sinωt (exact OLS over
the full-cycle grid up to fp-orthogonality), amplitude = √(a²+b²),
acrophase in hours, and the zero-amplitude F test
F = (n(a²+b²)/4)/(RSS/(n−3)).  All folds run in t order; trig is
shared libm.  Gives the existing 24 h spectral rows (Goertzel,
daily_cycle_power) their interpretable-units companion.
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_HOUR = 3_600_000_000
PERIOD = 24.0


def cosinor(x):
    """(mesor, amplitude, acrophase_hour, f_stat)."""
    n = len(x)
    fn = float(n)
    om = 2.0 * math.pi / PERIOD
    s = sa = sb = 0.0
    for t, v in enumerate(x):
        fv = float(v)
        s = s + fv
        sa = sa + fv * math.cos(om * float(t))
        sb = sb + fv * math.sin(om * float(t))
    mesor = s / fn
    a = 2.0 * sa / fn
    b = 2.0 * sb / fn
    amp = math.sqrt(a * a + b * b)
    acro = math.atan2(b, a)
    hour = acro / om
    if hour < 0.0:
        hour = hour + PERIOD
    rss = 0.0
    for t, v in enumerate(x):
        e = (float(v) - mesor - a * math.cos(om * float(t))
             - b * math.sin(om * float(t)))
        rss = rss + e * e
    f = ((fn * (a * a + b * b) / 4.0) / (rss / (fn - 3.0)))
    return mesor, amp, hour, f


def _cosinor_query():
    def q(sf_dir: str):
        from .queries_wave248 import _hourly_counts

        _, xh = _hourly_counts(sf_dir)
        mesor, amp, hour, f = cosinor([int(v) for v in xh])
        return pa.table({
            "mesor": pa.array([mesor], type=pa.float64()),
            "amplitude": pa.array([amp], type=pa.float64()),
            "acrophase_hour": pa.array([hour],
                                       type=pa.float64()),
            "f_stat": pa.array([f], type=pa.float64()),
        })

    om = "(2.0e0 * pi() / 24.0e0)"
    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour FROM events
    ),
    span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS hour
        FROM span
    ),
    d AS (
        SELECT g.hour - (SELECT lo FROM span) AS t,
               CAST(coalesce(c.cnt, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT hour, count(*) AS cnt FROM ev GROUP BY hour
        ) c ON g.hour = c.hour
    ),
    folds AS (
        SELECT CAST(count(*) AS DOUBLE) AS fn,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(y AS DOUBLE) ORDER BY t)),
                   (p, q) -> p + q) AS s,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(y AS DOUBLE)
                        * cos({om} * CAST(t AS DOUBLE))
                        ORDER BY t)), (p, q) -> p + q) AS sa,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(y AS DOUBLE)
                        * sin({om} * CAST(t AS DOUBLE))
                        ORDER BY t)), (p, q) -> p + q) AS sb
        FROM d
    ),
    coef AS (
        SELECT fn, s / fn AS mesor,
               2.0e0 * sa / fn AS a,
               2.0e0 * sb / fn AS b
        FROM folds
    ),
    rssq AS (
        SELECT coef.fn, coef.mesor, coef.a, coef.b,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list(
                       (CAST(y AS DOUBLE) - coef.mesor
                        - coef.a * cos({om} * CAST(t AS DOUBLE))
                        - coef.b * sin({om} * CAST(t AS DOUBLE)))
                       * (CAST(y AS DOUBLE) - coef.mesor
                          - coef.a
                            * cos({om} * CAST(t AS DOUBLE))
                          - coef.b
                            * sin({om} * CAST(t AS DOUBLE)))
                       ORDER BY t) FROM d)),
                   (p, q) -> p + q) AS rss
        FROM coef
    )
    SELECT mesor,
           sqrt(a * a + b * b) AS amplitude,
           CASE WHEN atan2(b, a) / {om} < 0.0e0
                THEN atan2(b, a) / {om} + 24.0e0
                ELSE atan2(b, a) / {om} END AS acrophase_hour,
           (fn * (a * a + b * b) / 4.0e0)
               / (rss / (fn - 3.0e0)) AS f_stat
    FROM rssq
    """
    return q, sql


def build_wave288_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_cosinor",) + _cosinor_query()))
    return queries, oracles
