"""Wave-231 query: Local Outlier Factor over daily activity.

events_daily_lof: Breunig's LOF (k=5) over the bounded daily
activity points (error count, purchase count) — the density-based
outlier view that MAD/sigma/Tukey fences cannot give. Determinism
discipline: neighbor sets and k-distances order by the EXACT
integer squared distance with day tiebreak; true distances are
sqrt of ints (identical on both engines); reachability
reach(a,b) = max(kdist(b), d(a,b)); lrd = k / sum(reach) and
LOF(a) = mean(lrd of neighbors)/lrd(a), every float sum a fold in
(d2, day) neighbor order. Emits the top-3 days (LOF DESC, day
ASC).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries_wave207 import _daily_ep

LOF_K = 5
LOF_TOP = 3


def daily_lof(e, p, k: int = LOF_K):
    """[(day_idx, lof)] for all points; days are 0-based grid
    indices."""
    n = len(e)
    pts = [(int(e[i]), int(p[i])) for i in range(n)]

    def d2(a, b):
        dx = pts[a][0] - pts[b][0]
        dy = pts[a][1] - pts[b][1]
        return dx * dx + dy * dy

    nbrs = []
    kdist = []
    for a in range(n):
        cand = sorted((d2(a, b), b) for b in range(n) if b != a)
        nb = cand[:k]
        nbrs.append(nb)
        kdist.append(math.sqrt(float(nb[-1][0])))
    lrd = []
    for a in range(n):
        s = 0.0
        for dd, b in nbrs[a]:
            reach = max(kdist[b], math.sqrt(float(dd)))
            s = s + reach
        lrd.append(k / s)
    lofs = []
    for a in range(n):
        s = 0.0
        for dd, b in nbrs[a]:
            s = s + lrd[b]
        lofs.append((a, (s / k) / lrd[a]))
    return lofs


# -------------------------------------------------- events_daily_lof
def _lof_query():
    def q(sf_dir: str):
        import ray.data as rd

        e, p = _daily_ep(sf_dir)
        lofs = daily_lof(list(e), list(p))
        lofs.sort(key=lambda r: (-r[1], r[0]))
        top = lofs[:LOF_TOP]
        tbl = pa.table({
            "day_idx": pa.array([r[0] for r in top],
                                type=pa.int64()),
            "lof": pa.array([r[1] for r in top],
                            type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    US_PER_DAY = 86_400_000_000
    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END AS is_p
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
    pairs AS (
        SELECT a.i AS ai, b.i AS bi,
               (a.e - b.e) * (a.e - b.e)
               + (a.p - b.p) * (a.p - b.p) AS d2
        FROM d a JOIN d b ON a.i <> b.i
    ),
    ranked AS (
        SELECT ai, bi, d2,
               row_number() OVER (PARTITION BY ai
                   ORDER BY d2, bi) AS rk
        FROM pairs
    ),
    nb AS (SELECT * FROM ranked WHERE rk <= {LOF_K}),
    kd AS (
        SELECT ai, sqrt(CAST(max(d2) AS DOUBLE)) AS kdist
        FROM nb GROUP BY ai
    ),
    lrd AS (
        SELECT nb.ai,
               {LOF_K}.0e0 / list_reduce(list_prepend(0.0e0,
                   list(greatest(kd.kdist,
                                 sqrt(CAST(nb.d2 AS DOUBLE)))
                        ORDER BY nb.d2, nb.bi)),
                   (s, v) -> s + v) AS val
        FROM nb JOIN kd ON kd.ai = nb.bi
        GROUP BY nb.ai
    ),
    lof AS (
        SELECT nb.ai,
               (list_reduce(list_prepend(0.0e0,
                    list(lb.val ORDER BY nb.d2, nb.bi)),
                    (s, v) -> s + v) / {LOF_K}.0e0)
               / (SELECT val FROM lrd la
                  WHERE la.ai = nb.ai) AS score
        FROM nb JOIN lrd lb ON lb.ai = nb.bi
        GROUP BY nb.ai
    ),
    pick AS (
        SELECT ai, score,
               row_number() OVER (ORDER BY score DESC, ai ASC)
                   AS rk
        FROM lof
    )
    SELECT CAST(ai AS BIGINT) AS day_idx, score AS lof
    FROM pick WHERE rk <= {LOF_TOP}
    """
    return q, sql


def build_wave231_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_daily_lof",) + _lof_query()))
    return queries, oracles
