"""Wave-292 query: Wang-Isola uniformity and alignment.

embedding_uniformity_align: the two contrastive-representation
quality losses of Wang & Isola (2020) on the L2-normalized 64-dim
embeddings: L_uniform = ln(mean_{i<j} exp(−2·‖z_i − z_j‖²)) over all
~125k pairs, and L_align = mean same-label pair squared distance.
Per-row normalization, every pairwise squared distance (64-term dim
fold) and both pair means are strictly ordered folds, identical on
both sides.  Anchors: perfectly uniform points on the sphere drive
L_uniform toward its minimum; collapsed embeddings give
L_uniform → 0 and L_align → 0 (checked in the harness).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def uniformity_align(rows, labels):
    """(n_pairs, n_same, l_uniform, l_align) — id-ordered rows."""
    n = len(rows)
    zs = []
    for r in rows:
        s = 0.0
        for v in r:
            s = s + v * v
        nrm = math.sqrt(s)
        zs.append([v / nrm for v in r])
    su = 0.0
    sa = 0.0
    n_pairs = 0
    n_same = 0
    for i in range(n):
        for j in range(i + 1, n):
            d2 = 0.0
            zi = zs[i]
            zj = zs[j]
            for k in range(len(zi)):
                diff = zi[k] - zj[k]
                d2 = d2 + diff * diff
            n_pairs += 1
            su = su + math.exp(-(2.0 * d2))
            if labels[i] == labels[j]:
                n_same += 1
                sa = sa + d2
    l_uniform = math.log(su / float(n_pairs))
    l_align = sa / float(n_same)
    return n_pairs, n_same, l_uniform, l_align


def _ua_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"])
        order = np.argsort(
            np.asarray(t.column("vec_id").to_pylist()))
        all_emb = t.column("embedding").to_pylist()
        labs = np.asarray(t.column("label").to_pylist())[order]
        rows = [[float(v) for v in all_emb[i]] for i in order]
        n_pairs, n_same, lu, la = uniformity_align(
            rows, [int(v) for v in labs])
        return pa.table({
            "n_pairs": pa.array([n_pairs], type=pa.int64()),
            "n_same_label": pa.array([n_same], type=pa.int64()),
            "l_uniform": pa.array([lu], type=pa.float64()),
            "l_align": pa.array([la], type=pa.float64()),
        })

    sql = """
    WITH z AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   v -> CAST(v AS DOUBLE)
                        / sqrt(list_reduce(list_prepend(0.0e0,
                              list_transform(embedding,
                                  w -> CAST(w AS DOUBLE)
                                       * CAST(w AS DOUBLE))),
                              (a, b) -> a + b))) AS zv
        FROM embeddings
    ),
    prs AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               CASE WHEN a.label = b.label THEN 1 ELSE 0 END
                   AS same,
               list_reduce(list_prepend(0.0e0,
                   list_transform(generate_series(1, 64),
                       k -> (a.zv[k] - b.zv[k])
                            * (a.zv[k] - b.zv[k]))),
                   (x, y) -> x + y) AS d2
        FROM z a JOIN z b ON b.vec_id > a.vec_id
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(same) AS BIGINT) AS n_same,
               list_reduce(list_prepend(0.0e0,
                   list(exp(-(2.0e0 * d2)) ORDER BY i, j)),
                   (x, y) -> x + y) AS su,
               list_reduce(list_prepend(0.0e0,
                   list(CASE WHEN same = 1 THEN d2
                             ELSE 0.0e0 END ORDER BY i, j)),
                   (x, y) -> x + y) AS sa
        FROM prs
    )
    SELECT n_pairs,
           n_same AS n_same_label,
           ln(su / CAST(n_pairs AS DOUBLE)) AS l_uniform,
           sa / CAST(n_same AS DOUBLE) AS l_align
    FROM agg
    """
    return q, sql


def build_wave292_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_uniformity_align",) + _ua_query()))
    return queries, oracles
