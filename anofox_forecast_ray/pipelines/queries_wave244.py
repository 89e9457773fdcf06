"""Wave-244 queries: visibility graphs and Hoeffding's D.

events_visibility_graph: the Lacasa et al. (2008/2009) natural and
horizontal visibility graphs of the daily error-count series.  Both
edge predicates are EXACT INTEGER comparisons — HVG: every strictly
interior sample is strictly below both endpoints; NVG: strictly below
the chord, cross-multiplied so no division ever happens
(y_k*(j-i) < y_i*(j-i) + (y_j-y_i)*(k-i)).  Emits node/edge counts,
max degrees and the NVG mean degree (one float division).  HVG is a
subgraph of NVG by construction.

events_hoeffding_d: Hoeffding's (1948) D dependence statistic between
daily error and purchase counts, with the Hmisc tie convention
(indicator + half-tie weights).  Everything is carried as QUARTERED /
DOUBLED integers — c4 = sum of (2·I(x<)+I(x=))(2·I(y<)+I(y=)) per
point, doubled midranks r2/s2 — so D1=A/16, D2=B/16, D3=C/16 share
one /16 that cancels into the final single float division
30·NUM/(16·n(n-1)(n-2)(n-3)(n-4)).  Bitwise parity is free: both
sides divide the same two exact integers once.
"""

from __future__ import annotations

import pyarrow as pa

US_PER_DAY = 86_400_000_000

_EP_GRID_CTE = f"""
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
        SELECT g.day,
               CAST(coalesce(c.e, 0) AS BIGINT) AS x,
               CAST(coalesce(c.p, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e, sum(is_p) AS p
            FROM ev GROUP BY day
        ) c ON g.day = c.day
    )
"""


def visibility_edges(y):
    """(hvg_edges, nvg_edges) as sorted (i, j) lists — O(n^3) brute,
    integer-only arithmetic."""
    n = len(y)
    hvg, nvg = [], []
    for i in range(n):
        for j in range(i + 1, n):
            h = v = True
            for k in range(i + 1, j):
                if not (y[k] < y[i] and y[k] < y[j]):
                    h = False
                if not (y[k] * (j - i)
                        < y[i] * (j - i) + (y[j] - y[i]) * (k - i)):
                    v = False
                if not (h or v):
                    break
            if h:
                hvg.append((i, j))
            if v:
                nvg.append((i, j))
    return hvg, nvg


def hoeffding_d(x, y):
    """(n, D) with the quartered-integer Hmisc tie convention."""
    n = len(x)
    a_sum = b_sum = c_sum = 0
    for i in range(n):
        c4 = 0
        ltx = eqx = lty = eqy = 0
        for j in range(n):
            if j == i:
                continue
            u = 2 if x[j] < x[i] else (1 if x[j] == x[i] else 0)
            v = 2 if y[j] < y[i] else (1 if y[j] == y[i] else 0)
            c4 += u * v
            if x[j] < x[i]:
                ltx += 1
            elif x[j] == x[i]:
                eqx += 1
            if y[j] < y[i]:
                lty += 1
            elif y[j] == y[i]:
                eqy += 1
        r2 = 2 * ltx + eqx + 2
        s2 = 2 * lty + eqy + 2
        a_sum += c4 * (c4 - 4)
        b_sum += (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)
        c_sum += (r2 - 4) * (s2 - 4) * c4
    num = (n - 2) * (n - 3) * a_sum + b_sum - 2 * (n - 2) * c_sum
    den = 16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return n, float(30 * num) / float(den)


# ------------------------------------------- events_visibility_graph
def _visibility_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        yv = [int(v) for v in e]
        hvg, nvg = visibility_edges(yv)
        n = len(yv)

        def max_deg(edges):
            deg = [0] * n
            for i, j in edges:
                deg[i] += 1
                deg[j] += 1
            return max(deg)

        return pa.table({
            "n_nodes": pa.array([n], type=pa.int64()),
            "hvg_edges": pa.array([len(hvg)], type=pa.int64()),
            "nvg_edges": pa.array([len(nvg)], type=pa.int64()),
            "hvg_max_degree": pa.array([max_deg(hvg)],
                                       type=pa.int64()),
            "nvg_max_degree": pa.array([max_deg(nvg)],
                                       type=pa.int64()),
            "nvg_mean_degree": pa.array(
                [float(2 * len(nvg)) / float(n)],
                type=pa.float64()),
        })

    sql = _EP_GRID_CTE + """,
    pij AS (
        SELECT a.day AS i, a.x AS yi, b.day AS j, b.x AS yj
        FROM d a JOIN d b ON b.day > a.day
    ),
    hvg AS (
        SELECT i, j FROM pij p
        WHERE NOT EXISTS (
            SELECT 1 FROM d k
            WHERE k.day > p.i AND k.day < p.j
              AND NOT (k.x < p.yi AND k.x < p.yj))
    ),
    nvg AS (
        SELECT i, j FROM pij p
        WHERE NOT EXISTS (
            SELECT 1 FROM d k
            WHERE k.day > p.i AND k.day < p.j
              AND NOT (k.x * (p.j - p.i)
                       < p.yi * (p.j - p.i)
                         + (p.yj - p.yi) * (k.day - p.i)))
    ),
    hdeg AS (
        SELECT v, count(*) AS deg FROM (
            SELECT i AS v FROM hvg
            UNION ALL SELECT j AS v FROM hvg
        ) GROUP BY v
    ),
    ndeg AS (
        SELECT v, count(*) AS deg FROM (
            SELECT i AS v FROM nvg
            UNION ALL SELECT j AS v FROM nvg
        ) GROUP BY v
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM hvg) AS hvg_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM nvg) AS nvg_edges,
           (SELECT CAST(max(deg) AS BIGINT) FROM hdeg)
               AS hvg_max_degree,
           (SELECT CAST(max(deg) AS BIGINT) FROM ndeg)
               AS nvg_max_degree,
           CAST(2 * (SELECT count(*) FROM nvg) AS DOUBLE)
           / CAST((SELECT count(*) FROM d) AS DOUBLE)
               AS nvg_mean_degree
    """
    return q, sql


# ----------------------------------------------- events_hoeffding_d
def _hoeffding_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, p = _daily_ep(sf_dir)
        n, dval = hoeffding_d([int(v) for v in e],
                              [int(v) for v in p])
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "hoeffding_d": pa.array([dval], type=pa.float64()),
        })

    sql = _EP_GRID_CTE + """,
    per AS (
        SELECT a.day,
               CAST(sum((CASE WHEN b.x < a.x THEN 2
                              WHEN b.x = a.x THEN 1
                              ELSE 0 END)
                        * (CASE WHEN b.y < a.y THEN 2
                                WHEN b.y = a.y THEN 1
                                ELSE 0 END)) AS BIGINT) AS c4,
               2 * CAST(sum(CASE WHEN b.x < a.x THEN 1 ELSE 0 END)
                        AS BIGINT)
               + CAST(sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END)
                      AS BIGINT) + 2 AS r2,
               2 * CAST(sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END)
                        AS BIGINT)
               + CAST(sum(CASE WHEN b.y = a.y THEN 1 ELSE 0 END)
                      AS BIGINT) + 2 AS s2
        FROM d a JOIN d b ON b.day <> a.day
        GROUP BY a.day
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c4 * (c4 - 4)) AS BIGINT) AS a_sum,
               CAST(sum((r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4))
                    AS BIGINT) AS b_sum,
               CAST(sum((r2 - 4) * (s2 - 4) * c4) AS BIGINT) AS c_sum
        FROM per
    )
    SELECT n AS n_days,
           CAST(30 * ((n - 2) * (n - 3) * a_sum + b_sum
                      - 2 * (n - 2) * c_sum) AS DOUBLE)
           / CAST(16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
                  AS DOUBLE) AS hoeffding_d
    FROM s
    """
    return q, sql


def build_wave244_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_visibility_graph",) + _visibility_query()))
    add(*(("events_hoeffding_d",) + _hoeffding_query()))
    return queries, oracles
