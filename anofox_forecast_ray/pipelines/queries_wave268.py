"""Wave-268 queries: Burg AR(2) and head/tail-breaks ht-index.

events_burg_ar2: the Burg (maximum-entropy) AR(2) fit to the dense
hourly count series — the alternative estimator to the wave-70
Yule-Walker fit.  The series is centered IN INTEGERS (u_t = n·x_t−S)
and both reflection coefficients collapse to explicit polynomials in
k1 with exact integer lag-sum coefficients (Σu_t·u_{t−1}, Σu_t·u_{t−2},
Σu²-ranges), so no per-sample float recursion exists anywhere:
k1 = −2·P1/Q1;  k2 = −2·(A2 + k1·(A1a+A1b) + k1²·M1)
               / ((M0+M2) + 2k1·(A1a+A1b) + 2k1²·M1);
φ1 = −(k1 + k1·k2), φ2 = −k2.  Verified against a classic
per-sample float Burg recursion and AR(2) parameter recovery.

doc_headtail_breaks: Jiang's (2013) ht-index of the doc length
distribution — recursively split at the mean while the head is a
non-empty minority (5·|head| ≤ 2·|set|); every membership test is
the exact integer n·x > S, so the recursion depth (the ht-index) is
bitwise deterministic.  A recursive CTE carries (S, n) as the set
descriptor (head means strictly increase, so the last threshold
defines the set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def burg_ar2(x):
    """(k1, k2, phi1, phi2) from integer series x (any scale)."""
    n = len(x)
    s = sum(x)
    u = [n * v - s for v in x]
    p1 = sum(u[t] * u[t - 1] for t in range(1, n))
    q1 = sum(u[t] * u[t] + u[t - 1] * u[t - 1]
             for t in range(1, n))
    k1 = -(2.0 * float(p1) / float(q1))
    a2 = sum(u[t] * u[t - 2] for t in range(2, n))
    a1a = sum(u[t] * u[t - 1] for t in range(2, n))
    a1b = sum(u[t - 1] * u[t - 2] for t in range(2, n))
    m0 = sum(u[t] * u[t] for t in range(2, n))
    m1 = sum(u[t - 1] * u[t - 1] for t in range(2, n))
    m2 = sum(u[t - 2] * u[t - 2] for t in range(2, n))
    num2 = (float(a2) + k1 * float(a1a + a1b)
            + (k1 * k1) * float(m1))
    den2 = (float(m0 + m2) + 2.0 * k1 * float(a1a + a1b)
            + 2.0 * (k1 * k1) * float(m1))
    k2 = -(2.0 * num2 / den2)
    phi1 = -(k1 + k1 * k2)
    phi2 = -k2
    return k1, k2, phi1, phi2


def ht_index(vals):
    """(ht, last_head, last_n) — integer head/tail break recursion."""
    s_prev, n_prev = -1, 0          # 0*x > -1 admits everything
    level = 0
    while True:
        cur = [v for v in vals if n_prev * v > s_prev]
        nn = len(cur)
        ss = sum(cur)
        head = sum(1 for v in cur if nn * v > ss)
        if nn <= 1 or head == 0 or 5 * head > 2 * nn:
            return level + 1, head, nn
        level += 1
        s_prev, n_prev = ss, nn


# ----------------------------------------------------- events_burg_ar2
def _burg_query():
    def q(sf_dir: str):
        from .queries_wave248 import _hourly_counts

        _, xh = _hourly_counts(sf_dir)
        k1, k2, phi1, phi2 = burg_ar2([int(v) for v in xh])
        return pa.table({
            "k1": pa.array([k1], type=pa.float64()),
            "k2": pa.array([k2], type=pa.float64()),
            "phi1": pa.array([phi1], type=pa.float64()),
            "phi2": pa.array([phi2], type=pa.float64()),
        })

    sql = """
    WITH ev AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS hour
        FROM span
    ),
    d AS (
        SELECT g.hour - (SELECT lo FROM span) AS t,
               CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT hour, count(*) AS cnt FROM ev GROUP BY hour
        ) c ON g.hour = c.hour
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(x) AS BIGINT) AS s
           FROM d),
    u AS (
        SELECT t, CAST(nn.n * d.x - nn.s AS HUGEINT) AS u
        FROM d CROSS JOIN nn
    ),
    lags AS (
        SELECT a.t, a.u AS u0, b.u AS u1, c.u AS u2
        FROM u a
        LEFT JOIN u b ON b.t = a.t - 1
        LEFT JOIN u c ON c.t = a.t - 2
    ),
    s1 AS (
        SELECT CAST(sum(u0 * u1) AS HUGEINT) AS p1,
               CAST(sum(u0 * u0 + u1 * u1) AS HUGEINT) AS q1
        FROM lags WHERE u1 IS NOT NULL
    ),
    s2 AS (
        SELECT CAST(sum(u0 * u2) AS HUGEINT) AS a2,
               CAST(sum(u0 * u1) AS HUGEINT) AS a1a,
               CAST(sum(u1 * u2) AS HUGEINT) AS a1b,
               CAST(sum(u0 * u0) AS HUGEINT) AS m0,
               CAST(sum(u1 * u1) AS HUGEINT) AS m1,
               CAST(sum(u2 * u2) AS HUGEINT) AS m2
        FROM lags WHERE u2 IS NOT NULL
    ),
    k1c AS (
        SELECT -(2.0 * CAST(s1.p1 AS DOUBLE)
                 / CAST(s1.q1 AS DOUBLE)) AS k1
        FROM s1
    ),
    k2c AS (
        SELECT k1c.k1,
               -(2.0 * (CAST(s2.a2 AS DOUBLE)
                        + k1c.k1 * CAST(s2.a1a + s2.a1b AS DOUBLE)
                        + (k1c.k1 * k1c.k1)
                          * CAST(s2.m1 AS DOUBLE))
                 / (CAST(s2.m0 + s2.m2 AS DOUBLE)
                    + 2.0 * k1c.k1
                      * CAST(s2.a1a + s2.a1b AS DOUBLE)
                    + 2.0 * (k1c.k1 * k1c.k1)
                      * CAST(s2.m1 AS DOUBLE))) AS k2
        FROM s2 CROSS JOIN k1c
    )
    SELECT k1, k2,
           -(k1 + k1 * k2) AS phi1,
           -k2 AS phi2
    FROM k2c
    """
    return q, sql


# ----------------------------------------------- doc_headtail_breaks
def _ht_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["n_chars"])
        vals = [int(v) for v in t.column("n_chars").to_pylist()]
        ht, last_head, last_n = ht_index(vals)
        return pa.table({
            "ht_index": pa.array([ht], type=pa.int64()),
            "last_head": pa.array([last_head], type=pa.int64()),
            "last_n": pa.array([last_n], type=pa.int64()),
        })

    sql = """
    WITH RECURSIVE v AS (
        SELECT CAST(n_chars AS BIGINT) AS x FROM documents
    ),
    r AS (
        SELECT 0 AS level, CAST(-1 AS BIGINT) AS s_prev,
               CAST(0 AS BIGINT) AS n_prev,
               (SELECT CAST(count(*) AS BIGINT) FROM v) AS nn,
               (SELECT CAST(sum(x) AS BIGINT) FROM v) AS ss,
               (SELECT CAST(count(*) AS BIGINT) FROM v, (
                    SELECT CAST(count(*) AS BIGINT) AS n0,
                           CAST(sum(x) AS BIGINT) AS s0 FROM v) m
                WHERE m.n0 * v.x > m.s0) AS head
        UNION ALL
        SELECT r.level + 1, r.ss, r.nn,
               (SELECT CAST(count(*) AS BIGINT) FROM v
                WHERE r.nn * x > r.ss) AS nn2,
               (SELECT CAST(sum(x) AS BIGINT) FROM v
                WHERE r.nn * x > r.ss) AS ss2,
               (SELECT CAST(count(*) AS BIGINT) FROM v
                WHERE r.nn * x > r.ss
                  AND (SELECT count(*) FROM v v2
                       WHERE r.nn * v2.x > r.ss) * x
                      > (SELECT sum(v3.x) FROM v v3
                         WHERE r.nn * v3.x > r.ss)) AS head2
        FROM r
        WHERE r.nn > 1 AND r.head > 0 AND 5 * r.head <= 2 * r.nn
    ),
    last AS (
        SELECT level, head, nn FROM r
        ORDER BY level DESC LIMIT 1
    )
    SELECT CAST(level + 1 AS BIGINT) AS ht_index,
           CAST(head AS BIGINT) AS last_head,
           CAST(nn AS BIGINT) AS last_n
    FROM last
    """
    return q, sql


def build_wave268_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_burg_ar2",) + _burg_query()))
    add(*(("doc_headtail_breaks",) + _ht_query()))
    return queries, oracles
