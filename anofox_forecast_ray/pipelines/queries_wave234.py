"""Wave-234 query: record days vs the i.i.d. records law.

events_record_days: the classical theory-of-records check on daily
error counts — the number of STRICT record highs and record lows
(integer fold over days) against the i.i.d. expectation
H_n = sum_{k=1..n} 1/k (records in exchangeable sequences do not
depend on the distribution): too many late records = trend. Emits
both counts, the harmonic expectation (fold in k order) and the
last record-high day index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries_wave207 import _daily_ep


def record_stats(x):
    """(n_high, n_low, last_high_idx, h_n) integer folds."""
    hi = None
    lo = None
    n_high = 0
    n_low = 0
    last_high = 0
    for i, v in enumerate(x):
        v = int(v)
        if hi is None or v > hi:
            hi = v
            n_high += 1
            last_high = i
        if lo is None or v < lo:
            lo = v
            n_low += 1
    h_n = 0.0
    for k in range(1, len(x) + 1):
        h_n = h_n + 1.0e0 / k
    return n_high, n_low, last_high, h_n


# ------------------------------------------------- events_record_days
def _records_query():
    def q(sf_dir: str):
        e, _ = _daily_ep(sf_dir)
        nh, nl, last, hn = record_stats(list(e))
        return pa.table({
            "n_record_highs": pa.array([nh], type=pa.int64()),
            "n_record_lows": pa.array([nl], type=pa.int64()),
            "last_high_idx": pa.array([last], type=pa.int64()),
            "expected_h_n": pa.array([hn], type=pa.float64()),
        })

    US_PER_DAY = 86_400_000_000
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
               CAST(coalesce(c.e, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    marks AS (
        SELECT i, x,
               CASE WHEN x > coalesce(max(x) OVER (ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), -1) THEN 1 ELSE 0 END
                   AS rec_hi,
               CASE WHEN x < coalesce(min(x) OVER (ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING),
                    CAST(1 AS BIGINT) << 62) THEN 1 ELSE 0 END
                   AS rec_lo
        FROM d
    ),
    s AS (
        SELECT CAST(sum(rec_hi) AS BIGINT) AS nh,
               CAST(sum(rec_lo) AS BIGINT) AS nl,
               CAST(max(CASE WHEN rec_hi = 1 THEN i END)
                    AS BIGINT) AS last_hi,
               CAST(count(*) AS BIGINT) AS n
        FROM marks
    ),
    hh AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1,
                       CAST((SELECT n FROM s) AS INTEGER)),
                       k -> 1.0e0 / CAST(k AS DOUBLE))),
                   (a, v) -> a + v) AS hn
        FROM (SELECT 1)
    )
    SELECT s.nh AS n_record_highs, s.nl AS n_record_lows,
           s.last_hi AS last_high_idx, hh.hn AS expected_h_n
    FROM s CROSS JOIN hh
    """
    return q, sql


def build_wave234_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_record_days",) + _records_query()))
    return queries, oracles
