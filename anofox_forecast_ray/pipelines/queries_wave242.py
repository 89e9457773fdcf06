"""Wave-242 query: rank (Spearman) autocorrelation at lag 1.

events_rank_acf1: the outlier-robust serial-dependence check — the
Spearman autocorrelation of daily error counts at lag 1: rank the
whole series with DOUBLED midranks (exact tie handling), then the
Pearson correlation of the (rank_t, rank_{t+1}) pairs from pure
int64 raw moments (doubled ranks have full spread, so the
raw-moment correlation is cancellation-safe). One sqrt, three
divisions.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks

US_PER_DAY = 86_400_000_000


def rank_acf1(x):
    """(n_pairs, rho) via doubled midranks + raw-moment corr."""
    import collections

    n = len(x)
    cnt = collections.Counter(int(v) for v in x)
    cum = 0
    m2 = {}
    for v in sorted(cnt):
        c = cnt[v]
        m2[v] = 2 * cum + c + 1
        cum += c
    r = [m2[int(v)] for v in x]
    a = r[:-1]
    b = r[1:]
    m = n - 1
    sa = sum(a)
    sb = sum(b)
    saa = sum(v * v for v in a)
    sbb = sum(v * v for v in b)
    sab = sum(p * q for p, q in zip(a, b))
    fm = float(m)
    num = fm * float(sab) - float(sa) * float(sb)
    den = math.sqrt((fm * float(saa) - float(sa) * float(sa))
                    * (fm * float(sbb)
                       - float(sb) * float(sb)))
    return m, num / den


# ------------------------------------------------- events_rank_acf1
def _rank_acf_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        m, rho = rank_acf1([int(v) for v in e])
        return pa.table({
            "n_pairs": pa.array([m], type=pa.int64()),
            "rank_acf1": pa.array([rho], type=pa.float64()),
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
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    hist AS (
        SELECT x, CAST(count(*) AS BIGINT) AS c,
               CAST(coalesce(sum(count(*)) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cum_b
        FROM d GROUP BY x
    ),
    ranked AS (
        SELECT d.day, 2 * hist.cum_b + hist.c + 1 AS m2
        FROM d JOIN hist ON d.x = hist.x
    ),
    pairs AS (
        SELECT m2 AS a,
               lead(m2) OVER (ORDER BY day) AS b
        FROM ranked
    ),
    pp AS (SELECT a, b FROM pairs WHERE b IS NOT NULL),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(a) AS BIGINT) AS sa,
               CAST(sum(b) AS BIGINT) AS sb,
               CAST(sum(a * a) AS BIGINT) AS saa,
               CAST(sum(b * b) AS BIGINT) AS sbb,
               CAST(sum(a * b) AS BIGINT) AS sab
        FROM pp
    )
    SELECT m AS n_pairs,
           (CAST(m AS DOUBLE) * CAST(sab AS DOUBLE)
            - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
           / sqrt((CAST(m AS DOUBLE) * CAST(saa AS DOUBLE)
                   - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                  * (CAST(m AS DOUBLE) * CAST(sbb AS DOUBLE)
                     - CAST(sb AS DOUBLE)
                       * CAST(sb AS DOUBLE)))
               AS rank_acf1
    FROM s
    """
    return q, sql


def build_wave242_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_rank_acf1",) + _rank_acf_query()))
    return queries, oracles
