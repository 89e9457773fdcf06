"""Wave-274 query: multivariate two-sample energy statistic.

embedding_energy_2sample: the Székely-Rizzo energy test statistic
between the label-0 and label-1 embedding clouds in the FULL 64-dim
space: T = (n0·n1/(n0+n1))·(2·E|X−Y| − E|X−X'| − E|Y−Y'|).  Every
Euclidean distance is a SEQUENTIAL 64-term squared-diff fold (dim
order) under one sqrt, and the three pair sums fold in (i, j) id
order — ~4.5k pairs × 64 dims replayed identically by the SQL
list_transform/list_reduce pipeline.  The multivariate companion of
embedding_mmd_poly (kernel) and doc_energy_distance (1-D).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def energy_2sample(x0, x1):
    """(n0, n1, e_stat, t_stat) from id-ordered float matrices."""
    def dist(a, b):
        s = 0.0
        for k in range(len(a)):
            diff = a[k] - b[k]
            s = s + diff * diff
        return math.sqrt(s)

    n0 = len(x0)
    n1 = len(x1)
    s01 = 0.0
    for a in x0:
        for b in x1:
            s01 = s01 + dist(a, b)
    s00 = 0.0
    for i in range(n0):
        for j in range(i + 1, n0):
            s00 = s00 + dist(x0[i], x0[j])
    s11 = 0.0
    for i in range(n1):
        for j in range(i + 1, n1):
            s11 = s11 + dist(x1[i], x1[j])
    m01 = s01 / (float(n0) * float(n1))
    m00 = 2.0 * s00 / (float(n0) * float(n0))
    m11 = 2.0 * s11 / (float(n1) * float(n1))
    e = 2.0 * m01 - m00 - m11
    t = (float(n0) * float(n1) / (float(n0) + float(n1))) * e
    return n0, n1, e, t


def _energy_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"])
        order = np.argsort(
            np.asarray(t.column("vec_id").to_pylist()))
        lab = np.asarray(t.column("label").to_pylist())[order]
        all_emb = t.column("embedding").to_pylist()
        emb = [all_emb[i] for i in order]
        x0 = [[float(v) for v in e]
              for e, l in zip(emb, lab) if l == 0]
        x1 = [[float(v) for v in e]
              for e, l in zip(emb, lab) if l == 1]
        n0, n1, e, t_stat = energy_2sample(x0, x1)
        return pa.table({
            "n0": pa.array([n0], type=pa.int64()),
            "n1": pa.array([n1], type=pa.int64()),
            "e_stat": pa.array([e], type=pa.float64()),
            "t_stat": pa.array([t_stat], type=pa.float64()),
        })

    dist = """sqrt(list_reduce(list_prepend(0.0e0,
                list_transform(generate_series(1, 64),
                    k -> (CAST(a.embedding[k] AS DOUBLE)
                          - CAST(b.embedding[k] AS DOUBLE))
                         * (CAST(a.embedding[k] AS DOUBLE)
                            - CAST(b.embedding[k] AS DOUBLE)))),
                (x, y) -> x + y))"""
    sql = f"""
    WITH r0 AS (
        SELECT vec_id, embedding FROM embeddings WHERE label = 0
    ),
    r1 AS (
        SELECT vec_id, embedding FROM embeddings WHERE label = 1
    ),
    nn AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM r0) AS n0,
               (SELECT CAST(count(*) AS BIGINT) FROM r1) AS n1
    ),
    d01 AS (
        SELECT a.vec_id AS i, b.vec_id AS j, {dist} AS d
        FROM r0 a CROSS JOIN r1 b
    ),
    d00 AS (
        SELECT a.vec_id AS i, b.vec_id AS j, {dist} AS d
        FROM r0 a JOIN r0 b ON b.vec_id > a.vec_id
    ),
    d11 AS (
        SELECT a.vec_id AS i, b.vec_id AS j, {dist} AS d
        FROM r1 a JOIN r1 b ON b.vec_id > a.vec_id
    ),
    s AS (
        SELECT
            (SELECT list_reduce(list_prepend(0.0e0,
                 list(d ORDER BY i, j)), (x, y) -> x + y)
             FROM d01) AS s01,
            (SELECT list_reduce(list_prepend(0.0e0,
                 list(d ORDER BY i, j)), (x, y) -> x + y)
             FROM d00) AS s00,
            (SELECT list_reduce(list_prepend(0.0e0,
                 list(d ORDER BY i, j)), (x, y) -> x + y)
             FROM d11) AS s11
    ),
    f AS (
        SELECT nn.n0, nn.n1,
               2.0 * (s.s01 / (CAST(nn.n0 AS DOUBLE)
                               * CAST(nn.n1 AS DOUBLE)))
               - 2.0 * s.s00 / (CAST(nn.n0 AS DOUBLE)
                                * CAST(nn.n0 AS DOUBLE))
               - 2.0 * s.s11 / (CAST(nn.n1 AS DOUBLE)
                                * CAST(nn.n1 AS DOUBLE)) AS e
        FROM s CROSS JOIN nn
    )
    SELECT n0, n1, e AS e_stat,
           (CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
            / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))) * e
               AS t_stat
    FROM f
    """
    return q, sql


def build_wave274_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_energy_2sample",) + _energy_query()))
    return queries, oracles
