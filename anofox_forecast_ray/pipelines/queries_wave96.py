"""Wave-96 query: Adjusted Rand Index for the k-means clustering.

- embedding_kmeans_ari: external clustering validation — the
  Adjusted Rand Index (Hubert & Arabie 1985) between the wave-72
  k-means assignment (after the two exact Lloyd steps, third
  assignment under the final centroids) and the embeddings table's
  ground-truth label column. The contingency table is bounded
  (k x #labels); every pair count sum C(n, 2) is exact int64 and the
  ARI is one scalar expression: (sum_ij C(nij,2) - E) / ((a + b)/2
  - E) with E = a*b / C(N,2), a/b the row/column pair sums.
  Completes the clustering-eval pair with
  embedding_silhouette_lite (internal) — both bitwise-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ari_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        from ..extras.ann import _to_matrix
        from .queries_wave72 import KM_K, _kmeans_query

        km_q, _ = _kmeans_query()
        km = km_q(sf_dir).to_pandas()
        cents = km.pivot(index="cluster", columns="dim",
                         values="centroid").to_numpy()
        head = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"])
        vid = head.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(vid)
        x = _to_matrix(head.column("embedding"))[order]
        labels = head.column("label").to_numpy(
            zero_copy_only=False)[order].astype(np.int64)
        diff = x[:, None, :] - cents[None, :, :]
        d2 = np.cumsum(diff * diff, axis=2)[:, :, -1]
        assign = np.argmin(d2, axis=1)
        ul = np.unique(labels)
        nl = ul.size
        cont = np.zeros((len(cents), nl), dtype=np.int64)
        for c, lb in zip(assign, labels):
            cont[int(c), int(np.searchsorted(ul, lb))] += 1

        def c2(v):
            return v * (v - 1) // 2

        sum_ij = int(c2(cont).sum())
        a_rows = cont.sum(axis=1)
        b_cols = cont.sum(axis=0)
        a = int(c2(a_rows).sum())
        b = int(c2(b_cols).sum())
        n = int(cont.sum())
        total = int(c2(np.int64(n)))
        e = float(a) * float(b) / float(total)
        denom = (float(a) + float(b)) / 2.0 - e
        ari = (float(sum_ij) - e) / denom if denom != 0 else 0.0
        return pa.table({
            "n_points": pa.array([n], type=pa.int64()),
            "n_labels": pa.array([int(nl)], type=pa.int64()),
            "pair_agree": pa.array([sum_ij], type=pa.int64()),
            "ari": pa.array([ari], type=pa.float64()),
        })

    from .queries_wave72 import _kmeans_query as _kq
    _, km_sql = _kq()
    cte_part = km_sql[: km_sql.rindex("SELECT c.cluster")]
    sql = f"""{cte_part},
    dist3 AS (
        SELECT e.vec_id, c.cluster,
               list_reduce(list_prepend(0.0e0,
                   list_transform(
                       generate_series(1, len(e.embedding)),
                       i -> (CAST(e.embedding[i] AS DOUBLE)
                             - c.cent[i])
                            * (CAST(e.embedding[i] AS DOUBLE)
                               - c.cent[i]))),
                   (a, b) -> a + b) AS d2
        FROM embeddings e CROSS JOIN cent2 c
    ),
    asg3 AS (
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster) AS rn
            FROM dist3)
        WHERE rn = 1
    ),
    cont AS (
        SELECT a.cluster, e.label,
               CAST(count(*) AS BIGINT) AS nij
        FROM asg3 a JOIN embeddings e ON e.vec_id = a.vec_id
        GROUP BY a.cluster, e.label
    ),
    sums AS (
        SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT)
                   AS sum_ij,
               CAST(sum(nij) AS BIGINT) AS n
        FROM cont
    ),
    ra AS (
        SELECT CAST(sum(r * (r - 1) // 2) AS BIGINT) AS a
        FROM (SELECT CAST(sum(nij) AS BIGINT) AS r
              FROM cont GROUP BY cluster)
    ),
    cb AS (
        SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS b
        FROM (SELECT CAST(sum(nij) AS BIGINT) AS c
              FROM cont GROUP BY label)
    )
    SELECT sums.n AS n_points,
           CAST((SELECT count(DISTINCT label) FROM embeddings)
                AS BIGINT) AS n_labels,
           sums.sum_ij AS pair_agree,
           CASE WHEN (CAST(ra.a AS DOUBLE) + CAST(cb.b AS DOUBLE))
                     / 2.0e0
                     - CAST(ra.a AS DOUBLE) * CAST(cb.b AS DOUBLE)
                       / CAST(sums.n * (sums.n - 1) // 2
                              AS DOUBLE) <> 0
                THEN (CAST(sums.sum_ij AS DOUBLE)
                      - CAST(ra.a AS DOUBLE)
                        * CAST(cb.b AS DOUBLE)
                        / CAST(sums.n * (sums.n - 1) // 2
                               AS DOUBLE))
                     / ((CAST(ra.a AS DOUBLE)
                         + CAST(cb.b AS DOUBLE)) / 2.0e0
                        - CAST(ra.a AS DOUBLE)
                          * CAST(cb.b AS DOUBLE)
                          / CAST(sums.n * (sums.n - 1) // 2
                                 AS DOUBLE))
                ELSE 0.0e0 END AS ari
    FROM sums CROSS JOIN ra CROSS JOIN cb
    """
    return q, sql


def build_wave96_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_kmeans_ari",) + _ari_query()))
    return queries, oracles
