"""Wave-204 queries: Hopkins statistic, Dunn index.

Cluster-geometry diagnostics over the embeddings table, with every
distance an EXACT int64 (micro-unit quantization, wave-47
convention) so min/max/argmin cannot float-flip:

- embedding_hopkins: the Hopkins clusterability statistic H =
  sum(u) / (sum(u) + sum(w)) on SQUARED distances, where u_j is the
  nearest-neighbor distance from each of 16 sha-derived uniform
  probe points (per-dim uniform over the data's bounding box) and
  w_j the leave-one-out NN distance from 16 sha-selected real
  points. H near 1 = clustered, near 0.5 = uniform.
- embedding_dunn_index: Dunn validity index over the 10 label
  clusters — sqrt(min inter-cluster pair distance^2 / max
  intra-cluster pair distance^2), both exact integer selections
  over all pairs.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

N_PROBES = 16
HEX = 12


def _quantized(sf_dir: str):
    import pyarrow.parquet as pq

    from ..extras.ann import _to_matrix

    ref = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    mat = np.round(
        _to_matrix(ref.column("embedding")) * 1_000_000.0
    ).astype(np.int64)
    vec_ids = np.asarray(ref.column("vec_id").to_pylist(),
                         dtype=np.int64)
    labels = np.asarray(ref.column("label").to_pylist(),
                        dtype=np.int64)
    order = np.argsort(vec_ids)
    return mat[order], vec_ids[order], labels[order]


def _sha_unit(s: str) -> float:
    return int(hashlib.sha256(s.encode()).hexdigest()[:HEX],
               16) / float(16 ** HEX)


def hopkins_parts(mat: np.ndarray, vec_ids: np.ndarray):
    """(sum_u, sum_w) exact ints."""
    lo = mat.min(axis=0)
    hi = mat.max(axis=0)
    probes = np.empty((N_PROBES, mat.shape[1]), dtype=np.int64)
    for j in range(N_PROBES):
        for d in range(mat.shape[1]):
            u = _sha_unit(f"hop|{j}|{d}")
            probes[j, d] = int(lo[d]) + int(
                u * float(int(hi[d]) - int(lo[d]) + 1))
    su = 0
    for j in range(N_PROBES):
        diff = mat - probes[j]
        su += int((diff * diff).sum(axis=1).min())
    # sha-selected real points: 16 smallest sha(vec_id) prefixes,
    # ties by vec_id
    keys = [(int(hashlib.sha256(str(int(v)).encode())
                 .hexdigest()[:HEX], 16), int(v), i)
            for i, v in enumerate(vec_ids)]
    keys.sort()
    sw = 0
    for _, vid, i in keys[:N_PROBES]:
        diff = mat - mat[i]
        dist = (diff * diff).sum(axis=1)
        dist[i] = np.int64(1) << 62
        sw += int(dist.min())
    return su, sw


# ------------------------------------------------- embedding_hopkins
def _hopkins_query():
    def q(sf_dir: str):
        mat, vec_ids, _ = _quantized(sf_dir)
        su, sw = hopkins_parts(mat, vec_ids)
        return pa.table({
            "sum_u": pa.array([su], type=pa.int64()),
            "sum_w": pa.array([sw], type=pa.int64()),
            "hopkins_h": pa.array([su / (su + sw)],
                                  type=pa.float64()),
        })

    sql = f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   e -> CAST(round_even(CAST(e AS DOUBLE)
                             * 1000000, 0) AS BIGINT)) AS v
        FROM embeddings
    ),
    dims AS (
        SELECT CAST(unnest(generate_series(1, 64)) AS INTEGER)
                   AS d
    ),
    bounds AS (
        SELECT dims.d,
               (SELECT min(v[dims.d]) FROM q) AS lo,
               (SELECT max(v[dims.d]) FROM q) AS hi
        FROM dims
    ),
    probes AS (
        SELECT pj.j,
               list(bounds.lo + CAST(floor(
                   (CAST(concat('0x', substr(sha256(
                        'hop|' || CAST(pj.j AS VARCHAR) || '|'
                        || CAST(bounds.d - 1 AS VARCHAR)),
                        1, {HEX})) AS BIGINT)
                    / CAST({16 ** HEX} AS DOUBLE))
                   * CAST(bounds.hi - bounds.lo + 1 AS DOUBLE))
                   AS BIGINT) ORDER BY bounds.d) AS p
        FROM (SELECT CAST(unnest(generate_series(0,
                  {N_PROBES - 1})) AS BIGINT) AS j) pj
        CROSS JOIN bounds
        GROUP BY pj.j
    ),
    u AS (
        SELECT probes.j,
               min(list_reduce(list_prepend(
                    CAST(0 AS BIGINT),
                    list_transform(generate_series(1, 64),
                        i -> (q.v[i] - probes.p[i])
                             * (q.v[i] - probes.p[i]))),
                    (a, x) -> a + x)) AS du
        FROM probes CROSS JOIN q
        GROUP BY probes.j
    ),
    samp AS (
        SELECT vec_id, v
        FROM q
        ORDER BY CAST(concat('0x', substr(sha256(
            CAST(vec_id AS VARCHAR)), 1, {HEX})) AS BIGINT),
            vec_id
        LIMIT {N_PROBES}
    ),
    w AS (
        SELECT samp.vec_id,
               min(list_reduce(list_prepend(
                    CAST(0 AS BIGINT),
                    list_transform(generate_series(1, 64),
                        i -> (q.v[i] - samp.v[i])
                             * (q.v[i] - samp.v[i]))),
                    (a, x) -> a + x)) AS dw
        FROM samp CROSS JOIN q
        WHERE q.vec_id <> samp.vec_id
        GROUP BY samp.vec_id
    ),
    s AS (
        SELECT (SELECT CAST(sum(du) AS BIGINT) FROM u) AS su,
               (SELECT CAST(sum(dw) AS BIGINT) FROM w) AS sw
        FROM (SELECT 1)
    )
    SELECT su AS sum_u, sw AS sum_w,
           CAST(su AS DOUBLE) / CAST(su + sw AS DOUBLE)
               AS hopkins_h
    FROM s
    """
    return q, sql


# ---------------------------------------------- embedding_dunn_index
def _dunn_query():
    def q(sf_dir: str):
        mat, vec_ids, labels = _quantized(sf_dir)
        sq = (mat * mat).sum(axis=1)
        g = mat @ mat.T
        dist = sq[:, None] + sq[None, :] - 2 * g
        same = labels[:, None] == labels[None, :]
        iu = np.triu_indices(mat.shape[0], k=1)
        inter = dist[iu][~same[iu]]
        intra = dist[iu][same[iu]]
        min_inter = int(inter.min())
        max_intra = int(intra.max())
        dunn = math.sqrt(min_inter / max_intra)
        return pa.table({
            "min_inter_sq": pa.array([min_inter],
                                     type=pa.int64()),
            "max_intra_sq": pa.array([max_intra],
                                     type=pa.int64()),
            "dunn_index": pa.array([dunn], type=pa.float64()),
        })

    sql = """
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   e -> CAST(round_even(CAST(e AS DOUBLE)
                             * 1000000, 0) AS BIGINT)) AS v
        FROM embeddings
    ),
    pairs AS (
        SELECT a.label AS la, b.label AS lb,
               list_reduce(list_prepend(
                    CAST(0 AS BIGINT),
                    list_transform(generate_series(1, 64),
                        i -> (a.v[i] - b.v[i])
                             * (a.v[i] - b.v[i]))),
                    (x, y) -> x + y) AS d2
        FROM q a JOIN q b ON a.vec_id < b.vec_id
    ),
    s AS (
        SELECT
            (SELECT CAST(min(d2) AS BIGINT) FROM pairs
             WHERE la <> lb) AS min_inter,
            (SELECT CAST(max(d2) AS BIGINT) FROM pairs
             WHERE la = lb) AS max_intra
        FROM (SELECT 1)
    )
    SELECT min_inter AS min_inter_sq,
           max_intra AS max_intra_sq,
           sqrt(CAST(min_inter AS DOUBLE)
                / CAST(max_intra AS DOUBLE)) AS dunn_index
    FROM s
    """
    return q, sql


def build_wave204_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_hopkins",) + _hopkins_query()))
    add(*(("embedding_dunn_index",) + _dunn_query()))
    return queries, oracles
