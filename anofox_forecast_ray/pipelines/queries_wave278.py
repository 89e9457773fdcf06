"""Wave-278 query: participation ratio of the embedding covariance.

embedding_participation_ratio: the effective dimensionality
PR = (Σλ)²/Σλ² of the 64-dim embedding covariance — computed WITHOUT
any eigendecomposition via the trace identities Σλ = tr(S) and
Σλ² = ‖S‖²_F.  Two-pass discipline: per-dim means (id-ordered
folds), then each of the 2080 upper-triangle covariance cells is an
id-ordered centered-product fold, and the Frobenius accumulation
runs in (d1, d2) order with off-diagonal cells doubled.  PR ≈ 64
for isotropic clouds, ≈ 1 for rank-1; verified against numpy
eigenvalues.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DIM = 64


def participation_ratio(rows):
    """(trace, frob2, pr) from id-ordered float rows."""
    n = len(rows)
    fn = float(n)
    means = []
    for d in range(DIM):
        s = 0.0
        for r in rows:
            s = s + r[d]
        means.append(s / fn)
    trace = 0.0
    frob2 = 0.0
    for d1 in range(DIM):
        for d2 in range(d1, DIM):
            s = 0.0
            m1 = means[d1]
            m2 = means[d2]
            for r in rows:
                s = s + (r[d1] - m1) * (r[d2] - m2)
            c = s / fn
            if d1 == d2:
                trace = trace + c
                frob2 = frob2 + c * c
            else:
                frob2 = frob2 + 2.0 * (c * c)
    pr = trace * trace / frob2
    return trace, frob2, pr


def _pr_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        order = np.argsort(
            np.asarray(t.column("vec_id").to_pylist()))
        all_emb = t.column("embedding").to_pylist()
        rows = [[float(v) for v in all_emb[i]] for i in order]
        trace, frob2, pr = participation_ratio(rows)
        return pa.table({
            "trace": pa.array([trace], type=pa.float64()),
            "frob2": pa.array([frob2], type=pa.float64()),
            "participation_ratio": pa.array([pr],
                                            type=pa.float64()),
            "pr_fraction": pa.array([pr / float(DIM)],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH vals AS (
        SELECT vec_id AS id,
               CAST(d AS BIGINT) AS d,
               CAST(embedding[CAST(d AS INT)] AS DOUBLE) AS x
        FROM embeddings,
             (SELECT unnest(generate_series(1, {DIM})) AS d)
    ),
    nn AS (
        SELECT CAST(count(DISTINCT id) AS BIGINT) AS n FROM vals
    ),
    means AS (
        SELECT d,
               list_reduce(list_prepend(0.0e0,
                   list(x ORDER BY id)), (a, b) -> a + b)
               / CAST((SELECT n FROM nn) AS DOUBLE) AS m
        FROM vals GROUP BY d
    ),
    cells AS (
        SELECT v1.d AS d1, v2.d AS d2,
               list_reduce(list_prepend(0.0e0,
                   list((v1.x - m1.m) * (v2.x - m2.m)
                        ORDER BY v1.id)), (a, b) -> a + b)
               / CAST((SELECT n FROM nn) AS DOUBLE) AS c
        FROM vals v1
        JOIN vals v2 ON v1.id = v2.id AND v2.d >= v1.d
        JOIN means m1 ON m1.d = v1.d
        JOIN means m2 ON m2.d = v2.d
        GROUP BY v1.d, v2.d, m1.m, m2.m
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CASE WHEN d1 = d2 THEN c ELSE 0.0e0 END
                     ORDER BY d1, d2)), (a, b) -> a + b)
                AS trace,
            list_reduce(list_prepend(0.0e0,
                list(CASE WHEN d1 = d2 THEN c * c
                          ELSE 2.0e0 * (c * c) END
                     ORDER BY d1, d2)), (a, b) -> a + b)
                AS frob2
        FROM cells
    )
    SELECT trace, frob2,
           trace * trace / frob2 AS participation_ratio,
           (trace * trace / frob2) / {float(DIM)!r}
               AS pr_fraction
    FROM folds
    """
    return q, sql


def build_wave278_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_participation_ratio",) + _pr_query()))
    return queries, oracles
