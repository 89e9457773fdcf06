"""Wave-249 queries: LZ76 complexity and Conover squared-ranks test.

events_lz76_complexity: Lempel-Ziv 1976 exhaustive-parsing complexity
of the daily error up-move chain (s_t = 1 if y_t > y_{t-1}).  The
parser is the textbook two-pointer scan — a phrase ends at the first
character that makes it unseen as a substring of the prefix ending
one character earlier — mirrored in SQL as a LINEAR recursive CTE
over (i, j, c) using position()/substr() on the aggregated 0/1
string; the trailing unfinished phrase adds one.  Verified against an
independent Kaspar-Schuster (1987) implementation.  Also emits the
usual normalization c·log2(n)/n.

source_conover_squared_ranks: Conover's squared-ranks test for a
SCALE difference between src0/src1 doc lengths.  Deviations from the
sample means are made integer by cross-multiplication
(u_A = |v·n1 − S1|·n2, u_B = |v·n2 − S2|·n1 — same ordering as
|v − x̄| on a common scale), pooled doubled midranks give quartered
integer sums T4 = Σ_A c·R2², P2 = Σc·R2², P4 = Σc·R2⁴, and the
tie-corrected z collapses to
z = (N·T4 − n1·P2) · sqrt((N−1)/(n1·n2·(N·P4 − P2²)))
— one sqrt of exact integers (HUGEINT in SQL).  Complements the
Ansari-Bradley test (wave-180) with the squared-ranks alternative.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def lz76(s: str):
    """(n, c) — exhaustive LZ76 phrase count of a 0/1 string."""
    n = len(s)
    c = 0
    i = 0
    while i < n:
        j = i + 1
        while j <= n and s[i:j] in s[0:j - 1]:
            j += 1
        c += 1
        i = j
    return n, c


def conover_squared_ranks(c0, c1, vals):
    """(n1, n2, t_stat, z) from per-value counts + values."""
    n1 = sum(c0)
    n2 = sum(c1)
    nn = n1 + n2
    s1 = sum(c * v for c, v in zip(c0, vals))
    s2 = sum(c * v for c, v in zip(c1, vals))
    pooled = {}
    for c, v in zip(c0, vals):
        if c:
            u = abs(v * n1 - s1) * n2
            e = pooled.setdefault(u, [0, 0])
            e[0] += c
    for c, v in zip(c1, vals):
        if c:
            u = abs(v * n2 - s2) * n1
            e = pooled.setdefault(u, [0, 0])
            e[1] += c
    t4 = p2 = p4 = 0
    cum = 0
    for u in sorted(pooled):
        ca, cb = pooled[u]
        cv = ca + cb
        r2 = 2 * cum + cv + 1
        t4 += ca * r2 * r2
        p2 += cv * r2 * r2
        p4 += cv * r2 * r2 * r2 * r2
        cum += cv
    z = (float(nn * t4 - n1 * p2)
         * math.sqrt(float(nn - 1)
                     / float(n1 * n2 * (nn * p4 - p2 * p2))))
    return n1, n2, float(t4) / 4.0, z


# --------------------------------------------- events_lz76_complexity
def _lz76_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        y = [int(v) for v in e]
        s = "".join("1" if b > a else "0"
                    for a, b in zip(y[:-1], y[1:]))
        n, c = lz76(s)
        norm = (float(c) * (math.log(float(n)) / math.log(2.0))
                / float(n))
        return pa.table({
            "n_chars": pa.array([n], type=pa.int64()),
            "lz76_c": pa.array([c], type=pa.int64()),
            "lz76_norm": pa.array([norm], type=pa.float64()),
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
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    moves AS (
        SELECT day,
               CASE WHEN y > lag(y) OVER (ORDER BY day)
                    THEN '1' ELSE '0' END AS b,
               lag(y) OVER (ORDER BY day) AS prev
        FROM d
    ),
    str AS (
        SELECT string_agg(b, '' ORDER BY day) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM moves WHERE prev IS NOT NULL
    ),
    lz AS (
        WITH RECURSIVE r AS (
            SELECT CAST(1 AS BIGINT) AS i, CAST(1 AS BIGINT) AS j,
                   CAST(0 AS BIGINT) AS c
            UNION ALL
            SELECT CASE WHEN hit THEN i ELSE j + 1 END,
                   j + 1,
                   CASE WHEN hit THEN c ELSE c + 1 END
            FROM (
                SELECT i, j, c,
                       CASE WHEN j - i = 0 THEN
                           position(substr((SELECT s FROM str),
                                           CAST(i AS INT), 1)
                               IN substr((SELECT s FROM str), 1,
                                         CAST(j - 1 AS INT))) > 0
                       ELSE
                           position(substr((SELECT s FROM str),
                                           CAST(i AS INT),
                                           CAST(j - i + 1 AS INT))
                               IN substr((SELECT s FROM str), 1,
                                         CAST(j - 1 AS INT))) > 0
                       END AS hit
                FROM r
            )
            WHERE i <= (SELECT n FROM str)
              AND j <= (SELECT n FROM str)
        )
        SELECT c + CASE WHEN i <= (SELECT n FROM str)
                        THEN 1 ELSE 0 END AS c
        FROM r
        WHERE i > (SELECT n FROM str) OR j > (SELECT n FROM str)
    )
    SELECT str.n AS n_chars,
           lz.c AS lz76_c,
           CAST(lz.c AS DOUBLE)
           * (ln(CAST(str.n AS DOUBLE)) / ln(2.0))
           / CAST(str.n AS DOUBLE) AS lz76_norm
    FROM str CROSS JOIN lz
    """
    return q, sql


# -------------------------------------- source_conover_squared_ranks
def _conover_query():
    def q(sf_dir: str):
        from .queries_wave180 import _two_source_hist

        h = _two_source_hist(sf_dir)
        n1, n2, t_stat, z = conover_squared_ranks(
            [int(v) for v in h["c0"]], [int(v) for v in h["c1"]],
            [int(v) for v in h["v"]])
        return pa.table({
            "n_a": pa.array([n1], type=pa.int64()),
            "n_b": pa.array([n2], type=pa.int64()),
            "t_stat": pa.array([t_stat], type=pa.float64()),
            "z_stat": pa.array([z], type=pa.float64()),
        })

    from .queries_wave180 import _SQL_HIST

    sql = f"""
    WITH {_SQL_HIST},
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n1,
               CAST(sum(c1) AS BIGINT) AS n2,
               CAST(sum(c0 * v) AS BIGINT) AS s1,
               CAST(sum(c1 * v) AS BIGINT) AS s2
        FROM h
    ),
    scored AS (
        SELECT abs(v * nn.n1 - nn.s1) * nn.n2 AS u,
               c0 AS ca, CAST(0 AS BIGINT) AS cb
        FROM h CROSS JOIN nn WHERE c0 > 0
        UNION ALL
        SELECT abs(v * nn.n2 - nn.s2) * nn.n1 AS u,
               CAST(0 AS BIGINT) AS ca, c1 AS cb
        FROM h CROSS JOIN nn WHERE c1 > 0
    ),
    pooled AS (
        SELECT u, CAST(sum(ca) AS BIGINT) AS ca,
               CAST(sum(ca + cb) AS BIGINT) AS cv
        FROM scored GROUP BY u
    ),
    ranked AS (
        SELECT ca, cv,
               2 * CAST(coalesce(sum(cv) OVER (ORDER BY u
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) + cv + 1 AS r2
        FROM pooled
    ),
    s AS (
        SELECT CAST(sum(CAST(ca AS HUGEINT) * r2 * r2) AS HUGEINT)
                   AS t4,
               CAST(sum(CAST(cv AS HUGEINT) * r2 * r2) AS HUGEINT)
                   AS p2,
               CAST(sum(CAST(cv AS HUGEINT) * r2 * r2 * r2 * r2)
                    AS HUGEINT) AS p4
        FROM ranked
    )
    SELECT nn.n1 AS n_a, nn.n2 AS n_b,
           CAST(s.t4 AS DOUBLE) / 4.0 AS t_stat,
           CAST(CAST(nn.n1 + nn.n2 AS HUGEINT) * s.t4
                - CAST(nn.n1 AS HUGEINT) * s.p2 AS DOUBLE)
           * sqrt(CAST(nn.n1 + nn.n2 - 1 AS DOUBLE)
                  / CAST(CAST(nn.n1 AS HUGEINT)
                         * CAST(nn.n2 AS HUGEINT)
                         * (CAST(nn.n1 + nn.n2 AS HUGEINT) * s.p4
                            - s.p2 * s.p2) AS DOUBLE)) AS z_stat
    FROM s CROSS JOIN nn
    """
    return q, sql


def build_wave249_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_lz76_complexity",) + _lz76_query()))
    add(*(("source_conover_squared_ranks",) + _conover_query()))
    return queries, oracles
