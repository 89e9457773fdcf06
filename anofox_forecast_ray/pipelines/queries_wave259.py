"""Wave-259 query: canonical correlation analysis, 2x2 closed form.

embedding_cca2: the two canonical correlations between the embedding
dimension pairs x = (e1, e2) and y = (e3, e4) across all vectors.
Covariances come from TWO-PASS centered LIST-accumulator folds in
vec_id order (the wave-92 discipline — raw moments cancel badly on
near-constant embedding coordinates); the 2x2 CCA then has a fully
closed form: rho² are the eigenvalues of Sxx⁻¹·Sxy·Syy⁻¹·Sxyᵀ, a
2x2 matrix whose trace/determinant quadratic is spelled as the same
explicit float chain on both sides.  Verified against an independent
numpy eigendecomposition and the perfect-rotation / independence
properties.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def cca2(rows):
    """(n, rho1, rho2) from id-ordered rows of (x1, x2, y1, y2)."""
    n = sx1 = sx2 = sy1 = sy2 = 0.0
    for x1, x2, y1, y2 in rows:
        n = n + 1.0
        sx1 = sx1 + x1
        sx2 = sx2 + x2
        sy1 = sy1 + y1
        sy2 = sy2 + y2
    mx1 = sx1 / n
    mx2 = sx2 / n
    my1 = sy1 / n
    my2 = sy2 / n
    a = b = c = d = e = f = g = h = i_ = j = 0.0
    for x1, x2, y1, y2 in rows:
        u1 = x1 - mx1
        u2 = x2 - mx2
        v1 = y1 - my1
        v2 = y2 - my2
        a = a + u1 * u1
        b = b + u1 * u2
        c = c + u2 * u2
        d = d + v1 * v1
        e = e + v1 * v2
        f = f + v2 * v2
        g = g + u1 * v1
        h = h + u1 * v2
        i_ = i_ + u2 * v1
        j = j + u2 * v2
    detx = a * c - b * b
    dety = d * f - e * e
    t11 = (g * f - h * e) / dety
    t12 = (-(g * e) + h * d) / dety
    t21 = (i_ * f - j * e) / dety
    t22 = (-(i_ * e) + j * d) / dety
    p11 = t11 * g + t12 * h
    p12 = t11 * i_ + t12 * j
    p21 = t21 * g + t22 * h
    p22 = t21 * i_ + t22 * j
    m11 = (c * p11 - b * p21) / detx
    m12 = (c * p12 - b * p22) / detx
    m21 = (-(b * p11) + a * p21) / detx
    m22 = (-(b * p12) + a * p22) / detx
    tr = m11 + m22
    det = m11 * m22 - m12 * m21
    disc = math.sqrt(tr * tr - 4.0 * det)
    rho1 = math.sqrt((tr + disc) / 2.0)
    rho2 = math.sqrt((tr - disc) / 2.0)
    return int(n), rho1, rho2


def _cca_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "id": pa.array([], type=pa.int64()),
                "x1": pa.array([], type=pa.float64()),
                "x2": pa.array([], type=pa.float64()),
                "y1": pa.array([], type=pa.float64()),
                "y2": pa.array([], type=pa.float64()),
            })
            if "embedding" not in t.column_names or t.num_rows == 0:
                return empty
            x = _to_matrix(t.column("embedding")).astype(
                np.float64)
            return pa.table({
                "id": t.column("vec_id").cast(pa.int64()),
                "x1": pa.array(x[:, 0]),
                "x2": pa.array(x[:, 1]),
                "y1": pa.array(x[:, 2]),
                "y2": pa.array(x[:, 3]),
            })

        refs = list(
            read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        rows = (tree_reduce_tables(refs, lambda t: t).to_pandas()
                .drop_duplicates("id").sort_values("id"))
        n, rho1, rho2 = cca2(list(zip(
            rows["x1"], rows["x2"], rows["y1"], rows["y2"])))
        return pa.table({
            "n_vectors": pa.array([n], type=pa.int64()),
            "cca_rho1": pa.array([rho1], type=pa.float64()),
            "cca_rho2": pa.array([rho2], type=pa.float64()),
        })

    sql = """
    WITH rows_ AS (
        SELECT vec_id AS id,
               CAST(embedding[1] AS DOUBLE) AS x1,
               CAST(embedding[2] AS DOUBLE) AS x2,
               CAST(embedding[3] AS DOUBLE) AS y1,
               CAST(embedding[4] AS DOUBLE) AS y2
        FROM embeddings
    ),
    f1 AS (
        SELECT list_reduce(
            list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0, 0.0e0],
                list([1.0e0, x1, x2, y1, y2] ORDER BY id)),
            (acc, r) -> [acc[1] + r[1], acc[2] + r[2],
                         acc[3] + r[3], acc[4] + r[4],
                         acc[5] + r[5]]) AS v
        FROM rows_
    ),
    f2 AS (
        SELECT f1.v[1] AS n,
               list_reduce(
                   list_prepend([0.0e0, 0.0e0, 0.0e0, 0.0e0,
                                 0.0e0, 0.0e0, 0.0e0, 0.0e0,
                                 0.0e0, 0.0e0],
                       (SELECT list(
                           [(x1 - f1.v[2] / f1.v[1])
                            * (x1 - f1.v[2] / f1.v[1]),
                            (x1 - f1.v[2] / f1.v[1])
                            * (x2 - f1.v[3] / f1.v[1]),
                            (x2 - f1.v[3] / f1.v[1])
                            * (x2 - f1.v[3] / f1.v[1]),
                            (y1 - f1.v[4] / f1.v[1])
                            * (y1 - f1.v[4] / f1.v[1]),
                            (y1 - f1.v[4] / f1.v[1])
                            * (y2 - f1.v[5] / f1.v[1]),
                            (y2 - f1.v[5] / f1.v[1])
                            * (y2 - f1.v[5] / f1.v[1]),
                            (x1 - f1.v[2] / f1.v[1])
                            * (y1 - f1.v[4] / f1.v[1]),
                            (x1 - f1.v[2] / f1.v[1])
                            * (y2 - f1.v[5] / f1.v[1]),
                            (x2 - f1.v[3] / f1.v[1])
                            * (y1 - f1.v[4] / f1.v[1]),
                            (x2 - f1.v[3] / f1.v[1])
                            * (y2 - f1.v[5] / f1.v[1])]
                           ORDER BY id) FROM rows_)),
                   (acc, r) -> [acc[1] + r[1], acc[2] + r[2],
                                acc[3] + r[3], acc[4] + r[4],
                                acc[5] + r[5], acc[6] + r[6],
                                acc[7] + r[7], acc[8] + r[8],
                                acc[9] + r[9],
                                acc[10] + r[10]]) AS c
        FROM f1
    ),
    mats AS (
        SELECT n,
               c[1] AS a, c[2] AS b, c[3] AS cc,
               c[4] AS d, c[5] AS e, c[6] AS f,
               c[7] AS g, c[8] AS h, c[9] AS i_, c[10] AS j
        FROM f2
    ),
    tmat AS (
        SELECT n, a, b, cc, g, h, i_, j,
               a * cc - b * b AS detx,
               (g * f - h * e) / (d * f - e * e) AS t11,
               (-(g * e) + h * d) / (d * f - e * e) AS t12,
               (i_ * f - j * e) / (d * f - e * e) AS t21,
               (-(i_ * e) + j * d) / (d * f - e * e) AS t22
        FROM mats
    ),
    pmat AS (
        SELECT n, a, b, cc, detx,
               t11 * g + t12 * h AS p11,
               t11 * i_ + t12 * j AS p12,
               t21 * g + t22 * h AS p21,
               t21 * i_ + t22 * j AS p22
        FROM tmat
    ),
    mmat AS (
        SELECT n,
               (cc * p11 - b * p21) / detx AS m11,
               (cc * p12 - b * p22) / detx AS m12,
               (-(b * p11) + a * p21) / detx AS m21,
               (-(b * p12) + a * p22) / detx AS m22
        FROM pmat
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           sqrt((m11 + m22
                 + sqrt((m11 + m22) * (m11 + m22)
                        - 4.0e0 * (m11 * m22 - m12 * m21)))
                / 2.0e0) AS cca_rho1,
           sqrt((m11 + m22
                 - sqrt((m11 + m22) * (m11 + m22)
                        - 4.0e0 * (m11 * m22 - m12 * m21)))
                / 2.0e0) AS cca_rho2
    FROM mmat
    """
    return q, sql


def build_wave259_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_cca2",) + _cca_query()))
    return queries, oracles
