"""Wave-291 query: cross-recurrence quantification analysis.

events_crqa: CRQA between the daily error and purchase series — the
cross-recurrence matrix R_ij = I(|e_i − p_j| ≤ r) with the integer
IQR//5+1 tolerance (the suite's sample-entropy convention), and the
standard quantifiers: recurrence rate, determinism (share of
recurrent points on diagonals of length ≥ 2) and the longest
diagonal line.  Diagonal runs are counted with the exact
gaps-and-islands identity (i − rank within diagonal), all integers.
The matrix-level companion of events_cross_apen on the same pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def crqa(e, p):
    """(r, n_rec, rr, det, lmax)."""
    n = len(e)
    pooled = sorted(e + p)
    m = len(pooled)
    q1 = pooled[(m + 3) // 4 - 1]
    q3 = pooled[(3 * m + 3) // 4 - 1]
    r = (q3 - q1) // 5 + 1
    rec = [[1 if abs(e[i] - p[j]) <= r else 0
            for j in range(n)] for i in range(n)]
    n_rec = sum(sum(row) for row in rec)
    rr = float(n_rec) / float(n * n)
    # diagonal runs (constant j - i)
    on_lines = 0
    lmax = 0
    for dlt in range(-(n - 1), n):
        run = 0
        for i in range(max(0, -dlt), min(n, n - dlt)):
            j = i + dlt
            if rec[i][j]:
                run += 1
            else:
                if run >= 2:
                    on_lines += run
                lmax = max(lmax, run)
                run = 0
        if run >= 2:
            on_lines += run
        lmax = max(lmax, run)
    det = float(on_lines) / float(n_rec)
    return r, n_rec, rr, det, lmax


def _crqa_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, p = _daily_ep(sf_dir)
        r, n_rec, rr, det, lmax = crqa(
            [int(v) for v in e], [int(v) for v in p])
        return pa.table({
            "tolerance": pa.array([r], type=pa.int64()),
            "n_recurrent": pa.array([n_rec], type=pa.int64()),
            "recurrence_rate": pa.array([rr], type=pa.float64()),
            "determinism": pa.array([det], type=pa.float64()),
            "l_max": pa.array([lmax], type=pa.int64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS is_p
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
               CAST(coalesce(c.e, 0) AS BIGINT) AS e,
               CAST(coalesce(c.p, 0) AS BIGINT) AS p
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e, sum(is_p) AS p
            FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    pooled AS (
        SELECT v, row_number() OVER (ORDER BY v) AS rk,
               count(*) OVER () AS m
        FROM (SELECT e AS v FROM d UNION ALL SELECT p FROM d)
    ),
    tol AS (
        SELECT ((SELECT v FROM pooled
                 WHERE rk = (3 * m + 3) // 4 LIMIT 1)
                - (SELECT v FROM pooled
                   WHERE rk = (m + 3) // 4 LIMIT 1)) // 5 + 1
                   AS r
    ),
    rec AS (
        SELECT a.i, b.i AS j, b.i - a.i AS dlt
        FROM d a CROSS JOIN d b
        WHERE abs(a.e - b.p) <= (SELECT r FROM tol)
    ),
    runs AS (
        SELECT dlt, i,
               i - row_number() OVER (PARTITION BY dlt
                                      ORDER BY i) AS grp
        FROM rec
    ),
    lines AS (
        SELECT dlt, grp, CAST(count(*) AS BIGINT) AS run_len
        FROM runs GROUP BY dlt, grp
    ),
    agg AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM rec)
                   AS n_rec,
               CAST(coalesce(sum(CASE WHEN run_len >= 2
                                      THEN run_len ELSE 0 END),
                             0) AS BIGINT) AS on_lines,
               CAST(coalesce(max(run_len), 0) AS BIGINT) AS lmax
        FROM lines
    )
    SELECT (SELECT CAST(r AS BIGINT) FROM tol) AS tolerance,
           agg.n_rec AS n_recurrent,
           CAST(agg.n_rec AS DOUBLE)
               / CAST(nn.n * nn.n AS DOUBLE) AS recurrence_rate,
           CAST(agg.on_lines AS DOUBLE)
               / CAST(agg.n_rec AS DOUBLE) AS determinism,
           agg.lmax AS l_max
    FROM agg CROSS JOIN nn
    """
    return q, sql


def build_wave291_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_crqa",) + _crqa_query()))
    return queries, oracles
