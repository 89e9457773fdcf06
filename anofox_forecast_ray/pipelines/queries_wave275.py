"""Wave-275 queries: entropy production and embedding hubness.

events_time_irreversibility: the entropy production rate of the
daily error up/flat/down chain — the KL divergence between forward
and reversed transition counts, Σ n_ij·ln(n_ij/n_ji) over ordered
pairs with both directions observed (the standard estimator of
detailed-balance violation; 0 ⇔ time-reversible).  Counts are exact
integers; the fold runs in (i, j) order and the skipped one-sided
pairs are counted separately.

embedding_hubness: the hubness skewness of the k=5 nearest-neighbor
in-degree distribution over the full 64-dim embedding cloud — the
classic high-dimensionality symptom (Radovanović et al. 2010).
Neighbor lists use deterministic (distance, id) ordering (distances
are identical 64-term ordered folds on both sides), in-degrees are
exact integers, and the skewness is the explicit integer central-
moment expansion.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000

K_NN = 5


def time_irreversibility(y):
    """(n_trans, n_paired, ep_rate) over the sign chain."""
    sgn = []
    for a, b in zip(y[:-1], y[1:]):
        sgn.append(1 if b > a else (-1 if b < a else 0))
    cnt = {}
    for i, j in zip(sgn[:-1], sgn[1:]):
        cnt[(i, j)] = cnt.get((i, j), 0) + 1
    ep = 0.0
    paired = 0
    for key in sorted(cnt):
        i, j = key
        nij = cnt[key]
        nji = cnt.get((j, i), 0)
        if nji > 0:
            paired += 1
            ep = ep + float(nij) * math.log(float(nij)
                                            / float(nji))
    return len(sgn) - 1, paired, ep


def hubness(emb_rows):
    """(n, max_indeg, skewness) from id-ordered 64-dim rows."""
    n = len(emb_rows)
    indeg = [0] * n
    for i in range(n):
        cand = []
        for j in range(n):
            if j == i:
                continue
            s = 0.0
            a = emb_rows[i]
            b = emb_rows[j]
            for k in range(len(a)):
                diff = a[k] - b[k]
                s = s + diff * diff
            cand.append((s, j))
        cand.sort()
        for _, j in cand[:K_NN]:
            indeg[j] += 1
    s1 = sum(indeg)
    s2 = sum(v * v for v in indeg)
    s3 = sum(v * v * v for v in indeg)
    fn = float(n)
    m1 = float(s1) / fn
    m2 = float(s2) / fn - m1 * m1
    m3 = (float(s3) / fn - 3.0 * m1 * (float(s2) / fn)
          + 2.0 * (m1 * m1 * m1))
    skew = m3 / (m2 * math.sqrt(m2))
    return n, max(indeg), skew


# ------------------------------------------ events_time_irreversibility
def _irrev_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        n, paired, ep = time_irreversibility([int(v) for v in e])
        return pa.table({
            "n_trans": pa.array([n], type=pa.int64()),
            "n_paired": pa.array([paired], type=pa.int64()),
            "entropy_production": pa.array([ep],
                                           type=pa.float64()),
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
    sgn AS (
        SELECT day,
               CASE WHEN y > lag(y) OVER (ORDER BY day) THEN 1
                    WHEN y < lag(y) OVER (ORDER BY day) THEN -1
                    ELSE 0 END AS s,
               lag(y) OVER (ORDER BY day) AS prev
        FROM d
    ),
    chain AS (
        SELECT s,
               lead(s) OVER (ORDER BY day) AS ns
        FROM sgn WHERE prev IS NOT NULL
    ),
    cnt AS (
        SELECT s AS i, ns AS j, CAST(count(*) AS BIGINT) AS n
        FROM chain WHERE ns IS NOT NULL GROUP BY s, ns
    ),
    paired AS (
        SELECT a.i, a.j, a.n AS nij, b.n AS nji
        FROM cnt a JOIN cnt b ON a.i = b.j AND a.j = b.i
    )
    SELECT (SELECT CAST(sum(n) AS BIGINT) FROM cnt) AS n_trans,
           (SELECT CAST(count(*) AS BIGINT) FROM paired)
               AS n_paired,
           coalesce((SELECT list_reduce(list_prepend(0.0e0,
                list(CAST(nij AS DOUBLE)
                     * ln(CAST(nij AS DOUBLE)
                          / CAST(nji AS DOUBLE))
                     ORDER BY i, j)), (x, y) -> x + y)
             FROM paired), 0.0e0) AS entropy_production
    """
    return q, sql


# ----------------------------------------------------- embedding_hubness
def _hubness_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        order = np.argsort(
            np.asarray(t.column("vec_id").to_pylist()))
        all_emb = t.column("embedding").to_pylist()
        emb = [[float(v) for v in all_emb[i]] for i in order]
        n, mx, skew = hubness(emb)
        return pa.table({
            "n_vectors": pa.array([n], type=pa.int64()),
            "max_indegree": pa.array([mx], type=pa.int64()),
            "hub_skewness": pa.array([skew], type=pa.float64()),
        })

    dist = """list_reduce(list_prepend(0.0e0,
                list_transform(generate_series(1, 64),
                    k -> (CAST(a.embedding[k] AS DOUBLE)
                          - CAST(b.embedding[k] AS DOUBLE))
                         * (CAST(a.embedding[k] AS DOUBLE)
                            - CAST(b.embedding[k] AS DOUBLE)))),
                (x, y) -> x + y)"""
    sql = f"""
    WITH prs AS (
        SELECT a.vec_id AS i, b.vec_id AS j, {dist} AS d
        FROM embeddings a JOIN embeddings b
          ON a.vec_id <> b.vec_id
    ),
    topk AS (
        SELECT i, j FROM (
            SELECT i, j,
                   row_number() OVER (PARTITION BY i
                                      ORDER BY d, j) AS rn
            FROM prs
        ) WHERE rn <= {K_NN}
    ),
    indeg AS (
        SELECT e.vec_id,
               CAST(coalesce(t.c, 0) AS BIGINT) AS deg
        FROM embeddings e LEFT JOIN (
            SELECT j, count(*) AS c FROM topk GROUP BY j
        ) t ON e.vec_id = t.j
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(deg) AS BIGINT) AS s1,
               CAST(sum(deg * deg) AS BIGINT) AS s2,
               CAST(sum(deg * deg * deg) AS BIGINT) AS s3,
               CAST(max(deg) AS BIGINT) AS mx
        FROM indeg
    ),
    f AS (
        SELECT n, mx, CAST(n AS DOUBLE) AS fn,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
               CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3
        FROM s
    )
    SELECT n AS n_vectors,
           mx AS max_indegree,
           (r3 - 3.0 * m1 * r2 + 2.0 * (m1 * m1 * m1))
           / ((r2 - m1 * m1) * sqrt(r2 - m1 * m1))
               AS hub_skewness
    FROM f
    """
    return q, sql


def build_wave275_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_time_irreversibility",) + _irrev_query()))
    add(*(("embedding_hubness",) + _hubness_query()))
    return queries, oracles
