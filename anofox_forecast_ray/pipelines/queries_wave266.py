"""Wave-266 queries: Markov-order G2 test and Mardia kurtosis.

corpus_markov_order_g2: the likelihood-ratio test of Markov order 1
vs order 2 for the within-doc token chain —
G2 = 2·Σ_abc n_abc·ln(n_abc·n_·b· / (n_ab·­·n_·bc)) over the bounded
trigram histogram, with all marginals derived from the SAME trigram
windows (so the identity Σ n_abc = Σ n_ab· holds exactly).  Counts
are exact integers from a vectorized per-block partial (doc
boundaries masked by row index); the fold runs in (a,b,c) order.
The order-2 sequel to corpus_bigram_g2.

embedding_mardia_kurtosis: Mardia's multivariate kurtosis b2 for the
first two embedding dimensions — the mean squared Mahalanobis
distance, with the 2x2 MLE covariance inverted in closed form.
Three id-ordered sequential folds (means → centered seconds →
Σd_i²); under normality b2 → d(d+2) = 8, and the excess is reported.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks
from ._scaffold import read_cols


def markov_order_g2(tri):
    """(n_tri, g2) from {(a,b,c): count}."""
    nab = {}
    nbc = {}
    nb = {}
    for (a, b, c), n in tri.items():
        nab[(a, b)] = nab.get((a, b), 0) + n
        nbc[(b, c)] = nbc.get((b, c), 0) + n
        nb[b] = nb.get(b, 0) + n
    g = 0.0
    total = 0
    for key in sorted(tri):
        a, b, c = key
        n = tri[key]
        total += n
        g = g + float(n) * math.log(
            float(n * nb[b]) / float(nab[(a, b)] * nbc[(b, c)]))
    return total, 2.0 * g


def mardia_kurtosis(rows):
    """(n, b2, excess) from id-ordered (x1, x2) pairs."""
    n = sx1 = sx2 = 0.0
    for x1, x2 in rows:
        n = n + 1.0
        sx1 = sx1 + x1
        sx2 = sx2 + x2
    m1 = sx1 / n
    m2 = sx2 / n
    a = b = c = 0.0
    for x1, x2 in rows:
        u1 = x1 - m1
        u2 = x2 - m2
        a = a + u1 * u1
        b = b + u1 * u2
        c = c + u2 * u2
    det = a * c - b * b
    s = 0.0
    for x1, x2 in rows:
        u1 = x1 - m1
        u2 = x2 - m2
        d = n * ((c * (u1 * u1) - 2.0 * b * (u1 * u2)
                  + a * (u2 * u2)) / det)
        s = s + d * d
    b2 = s / n
    return int(n), b2, b2 - 8.0


# --------------------------------------------- corpus_markov_order_g2
def _g2_query():
    def q(sf_dir: str):
        from .queries import corpus_ds
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "key": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size < 3:
                return empty
            row = np.repeat(
                np.arange(lengths.size, dtype=np.int64), lengths)
            v = values.astype(np.int64)
            ok = row[:-2] == row[2:]
            key = ((v[:-2][ok] << 42) | (v[1:-1][ok] << 21)
                   | v[2:][ok])
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "key": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("key").aggregate([("cnt", "sum")])
            return pa.table({
                "key": g.column("key").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        mask = (1 << 21) - 1
        tri = {}
        for k, n in zip(h["key"].astype(int), h["cnt"].astype(int)):
            tri[(k >> 42, (k >> 21) & mask, k & mask)] = int(n)
        total, g2 = markov_order_g2(tri)
        return pa.table({
            "n_trigrams": pa.array([total], type=pa.int64()),
            "g2": pa.array([g2], type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tri AS (
        SELECT token AS a,
               lead(token, 1) OVER (PARTITION BY doc_id
                                    ORDER BY pos) AS b,
               lead(token, 2) OVER (PARTITION BY doc_id
                                    ORDER BY pos) AS c
        FROM tok
    ),
    h AS (
        SELECT a, b, c, CAST(count(*) AS BIGINT) AS n
        FROM tri WHERE c IS NOT NULL
        GROUP BY a, b, c
    ),
    mab AS (
        SELECT a, b, CAST(sum(n) AS BIGINT) AS nab
        FROM h GROUP BY a, b
    ),
    mbc AS (
        SELECT b, c, CAST(sum(n) AS BIGINT) AS nbc
        FROM h GROUP BY b, c
    ),
    mb AS (
        SELECT b, CAST(sum(n) AS BIGINT) AS nb
        FROM h GROUP BY b
    ),
    terms AS (
        SELECT h.a, h.b, h.c, h.n,
               CAST(h.n AS DOUBLE)
               * ln(CAST(h.n * mb.nb AS DOUBLE)
                    / CAST(mab.nab * mbc.nbc AS DOUBLE)) AS t
        FROM h
        JOIN mab ON h.a = mab.a AND h.b = mab.b
        JOIN mbc ON h.b = mbc.b AND h.c = mbc.c
        JOIN mb ON h.b = mb.b
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_trigrams,
           2.0 * list_reduce(list_prepend(0.0e0,
               list(t ORDER BY a, b, c)), (x, y) -> x + y) AS g2
    FROM terms
    """
    return q, sql


# ----------------------------------------- embedding_mardia_kurtosis
def _mardia_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "id": pa.array([], type=pa.int64()),
                "x1": pa.array([], type=pa.float64()),
                "x2": pa.array([], type=pa.float64()),
            })
            if "embedding" not in t.column_names or t.num_rows == 0:
                return empty
            x = _to_matrix(t.column("embedding")).astype(
                np.float64)
            return pa.table({
                "id": t.column("vec_id").cast(pa.int64()),
                "x1": pa.array(x[:, 0]),
                "x2": pa.array(x[:, 1]),
            })

        refs = list(
            read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        rows = (tree_reduce_tables(refs, lambda t: t).to_pandas()
                .drop_duplicates("id").sort_values("id"))
        n, b2, excess = mardia_kurtosis(
            list(zip(rows["x1"], rows["x2"])))
        return pa.table({
            "n_vectors": pa.array([n], type=pa.int64()),
            "mardia_b2": pa.array([b2], type=pa.float64()),
            "excess": pa.array([excess], type=pa.float64()),
        })

    sql = """
    WITH rows_ AS (
        SELECT vec_id AS id,
               CAST(embedding[1] AS DOUBLE) AS x1,
               CAST(embedding[2] AS DOUBLE) AS x2
        FROM embeddings
    ),
    f1 AS (
        SELECT list_reduce(
            list_prepend([0.0e0, 0.0e0, 0.0e0],
                list([1.0e0, x1, x2] ORDER BY id)),
            (acc, r) -> [acc[1] + r[1], acc[2] + r[2],
                         acc[3] + r[3]]) AS v
        FROM rows_
    ),
    f2 AS (
        SELECT f1.v[1] AS n,
               f1.v[2] / f1.v[1] AS m1,
               f1.v[3] / f1.v[1] AS m2,
               list_reduce(
                   list_prepend([0.0e0, 0.0e0, 0.0e0],
                       (SELECT list(
                           [(x1 - f1.v[2] / f1.v[1])
                            * (x1 - f1.v[2] / f1.v[1]),
                            (x1 - f1.v[2] / f1.v[1])
                            * (x2 - f1.v[3] / f1.v[1]),
                            (x2 - f1.v[3] / f1.v[1])
                            * (x2 - f1.v[3] / f1.v[1])]
                           ORDER BY id) FROM rows_)),
                   (acc, r) -> [acc[1] + r[1], acc[2] + r[2],
                                acc[3] + r[3]]) AS c
        FROM f1
    ),
    f3 AS (
        SELECT f2.n,
               list_reduce(list_prepend(0.0e0,
                   (SELECT list(
                       (f2.n * ((f2.c[3] * ((x1 - f2.m1)
                                            * (x1 - f2.m1))
                                 - 2.0e0 * f2.c[2]
                                   * ((x1 - f2.m1)
                                      * (x2 - f2.m2))
                                 + f2.c[1] * ((x2 - f2.m2)
                                              * (x2 - f2.m2)))
                                / (f2.c[1] * f2.c[3]
                                   - f2.c[2] * f2.c[2])))
                       * (f2.n * ((f2.c[3] * ((x1 - f2.m1)
                                              * (x1 - f2.m1))
                                   - 2.0e0 * f2.c[2]
                                     * ((x1 - f2.m1)
                                        * (x2 - f2.m2))
                                   + f2.c[1] * ((x2 - f2.m2)
                                                * (x2 - f2.m2)))
                                  / (f2.c[1] * f2.c[3]
                                     - f2.c[2] * f2.c[2])))
                       ORDER BY id) FROM rows_)),
                   (a, b) -> a + b) AS s
        FROM f2
    )
    SELECT CAST(n AS BIGINT) AS n_vectors,
           s / n AS mardia_b2,
           s / n - 8.0e0 AS excess
    FROM f3
    """
    return q, sql


def build_wave266_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("corpus_markov_order_g2",) + _g2_query()))
    add(*(("embedding_mardia_kurtosis",) + _mardia_query()))
    return queries, oracles
