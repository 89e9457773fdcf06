"""Wave-261 query: generalized ESD (Rosner) outlier cascade.

events_gesd_outliers: Rosner's (1983) generalized extreme studentized
deviate procedure with k=3 on daily error counts — iteratively pick
the observation with the largest |x − x̄| over the REMAINING set,
report its studentized R_i, remove it, recompute.  Each argmax is a
PURE INTEGER comparison |n_a·x − S| (ties → smallest day), and each
R_i is one identical float expression of (d, n_a, S, SS), so the
whole cascade — selection order included — is bitwise deterministic.
The SQL unrolls the three rounds as chained CTEs.  The multi-outlier
companion of events_outliers / doc_grubbs_max_z (GESD fixes Grubbs'
masking problem).
"""

from __future__ import annotations

import math

import pyarrow as pa

US_PER_DAY = 86_400_000_000

K_OUT = 3


def gesd(x, k=K_OUT):
    """[(day_idx, r_i)] — k rounds of exact-integer ESD selection."""
    active = list(range(len(x)))
    out = []
    for _ in range(k):
        n_a = len(active)
        s = sum(x[i] for i in active)
        ss = sum(x[i] * x[i] for i in active)
        best = None
        for i in active:      # ascending i: first max == smallest day
            d = abs(n_a * x[i] - s)
            if best is None or d > best[0]:
                best = (d, i)
        d, idx = best
        if n_a * ss - s * s == 0:     # constant remainder: R := 0
            r = 0.0
        else:
            r = ((float(d) / float(n_a))
                 / math.sqrt(float(n_a * ss - s * s)
                             / (float(n_a)
                                * (float(n_a) - 1.0))))
        out.append((idx, r))
        active.remove(idx)
    return out


def _gesd_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        rounds = gesd([int(v) for v in e])
        cols = {}
        for i, (idx, r) in enumerate(rounds, start=1):
            cols[f"day{i}"] = pa.array([idx], type=pa.int64())
            cols[f"r{i}"] = pa.array([r], type=pa.float64())
        return pa.table(cols)

    def round_cte(prev_set: str, tag: str) -> str:
        return f"""
    s{tag} AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss
        FROM {prev_set}
    ),
    m{tag} AS (
        SELECT a.i AS day, abs(s{tag}.n * a.y - s{tag}.s) AS d,
               s{tag}.n AS n, s{tag}.s AS s, s{tag}.ss AS ss
        FROM {prev_set} a CROSS JOIN s{tag}
        ORDER BY abs(s{tag}.n * a.y - s{tag}.s) DESC, a.i ASC
        LIMIT 1
    )"""

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
    a0 AS (
        SELECT g.day - (SELECT lo FROM span) AS i,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),{round_cte('a0', '1')},
    a1 AS (
        SELECT i, y FROM a0
        WHERE i <> (SELECT day FROM m1)
    ),{round_cte('a1', '2')},
    a2 AS (
        SELECT i, y FROM a1
        WHERE i <> (SELECT day FROM m2)
    ),{round_cte('a2', '3')}
    SELECT
        m1.day AS day1,
        CASE WHEN m1.n * m1.ss - m1.s * m1.s = 0 THEN 0.0
             ELSE (CAST(m1.d AS DOUBLE) / CAST(m1.n AS DOUBLE))
        / sqrt(CAST(m1.n * m1.ss - m1.s * m1.s AS DOUBLE)
               / (CAST(m1.n AS DOUBLE)
                  * (CAST(m1.n AS DOUBLE) - 1.0))) END AS r1,
        m2.day AS day2,
        CASE WHEN m2.n * m2.ss - m2.s * m2.s = 0 THEN 0.0
             ELSE (CAST(m2.d AS DOUBLE) / CAST(m2.n AS DOUBLE))
        / sqrt(CAST(m2.n * m2.ss - m2.s * m2.s AS DOUBLE)
               / (CAST(m2.n AS DOUBLE)
                  * (CAST(m2.n AS DOUBLE) - 1.0))) END AS r2,
        m3.day AS day3,
        CASE WHEN m3.n * m3.ss - m3.s * m3.s = 0 THEN 0.0
             ELSE (CAST(m3.d AS DOUBLE) / CAST(m3.n AS DOUBLE))
        / sqrt(CAST(m3.n * m3.ss - m3.s * m3.s AS DOUBLE)
               / (CAST(m3.n AS DOUBLE)
                  * (CAST(m3.n AS DOUBLE) - 1.0))) END AS r3
    FROM m1 CROSS JOIN m2 CROSS JOIN m3
    """
    return q, sql


def build_wave261_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_gesd_outliers",) + _gesd_query()))
    return queries, oracles
