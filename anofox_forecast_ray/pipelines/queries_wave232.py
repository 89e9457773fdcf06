"""Wave-232 query: local intrinsic dimensionality (LID).

embedding_lid: the Levina-Bickel / Amsaleg MLE of LOCAL INTRINSIC
DIMENSIONALITY at each embedding, LID(x) = -k / sum_{i<k}
ln(d_i/d_k) over the k=10 nearest neighbors — the representation-
geometry diagnostic (low LID = points live on a thin manifold).
Determinism discipline: squared distances are exact int64
(micro-unit quantization + the matmul identity), the neighbor set
orders by (d2, vec_id), zero-distance duplicates are excluded from
the k-set, and each log term is ln of an exact integer ratio
(ln(d_i/d_k) = 0.5 ln(d2_i/d2_k)). Emits n and the mean LID
(fold in vec_id order).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries_wave204 import _quantized

LID_K = 10


def lid_scores(mat: np.ndarray, vec_ids: np.ndarray,
               k: int = LID_K):
    """[(vec_id, lid)] for every point with >= k positive-distance
    neighbors."""
    sq = (mat * mat).sum(axis=1)
    g = mat @ mat.T
    dist = sq[:, None] + sq[None, :] - 2 * g
    n = mat.shape[0]
    out = []
    for a in range(n):
        cand = sorted((int(dist[a, b]), int(vec_ids[b]))
                      for b in range(n)
                      if b != a and dist[a, b] > 0)
        if len(cand) < k:
            continue
        nb = cand[:k]
        dk = nb[-1][0]
        s = 0.0
        for d2, _ in nb:
            s = s + math.log(d2 / dk)
        lid = -(2.0e0 * k) / s
        out.append((int(vec_ids[a]), lid))
    return out


# ----------------------------------------------------- embedding_lid
def _lid_query():
    def q(sf_dir: str):
        mat, vec_ids, _ = _quantized(sf_dir)
        rows = lid_scores(mat, vec_ids)
        rows.sort()
        n = len(rows)
        s = 0.0
        for _, v in rows:
            s = s + v
        return pa.table({
            "n_points": pa.array([n], type=pa.int64()),
            "mean_lid": pa.array([s / n], type=pa.float64()),
        })

    sql = f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   e -> CAST(round_even(CAST(e AS DOUBLE)
                             * 1000000, 0) AS BIGINT)) AS v
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS ai, b.vec_id AS bi,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, 64),
                       i -> (a.v[i] - b.v[i])
                            * (a.v[i] - b.v[i]))),
                   (x, y) -> x + y) AS d2
        FROM q a JOIN q b ON a.vec_id <> b.vec_id
    ),
    pos AS (
        SELECT ai, bi, d2,
               row_number() OVER (PARTITION BY ai
                   ORDER BY d2, bi) AS rk
        FROM pairs WHERE d2 > 0
    ),
    nb AS (SELECT * FROM pos WHERE rk <= {LID_K}),
    ok AS (
        SELECT ai FROM nb GROUP BY ai
        HAVING count(*) = {LID_K}
    ),
    kd AS (
        SELECT ai, CAST(max(d2) AS BIGINT) AS dk
        FROM nb GROUP BY ai
    ),
    lids AS (
        SELECT nb.ai,
               -(2.0e0 * {LID_K}.0e0)
               / list_reduce(list_prepend(0.0e0,
                   list(ln(CAST(nb.d2 AS DOUBLE)
                           / CAST(kd.dk AS DOUBLE))
                        ORDER BY nb.d2, nb.bi)),
                   (s, v) -> s + v) AS lid
        FROM nb JOIN kd ON kd.ai = nb.ai
        JOIN ok ON ok.ai = nb.ai
        GROUP BY nb.ai
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list_reduce(list_prepend(0.0e0,
                   list(lid ORDER BY ai)), (s, v) -> s + v)
                   AS total
        FROM lids
    )
    SELECT n AS n_points,
           total / CAST(n AS DOUBLE) AS mean_lid
    FROM agg
    """
    return q, sql


def build_wave232_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_lid",) + _lid_query()))
    return queries, oracles
