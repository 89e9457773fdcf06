"""Wave-79 queries: Johnson-Lindenstrauss projection audit and
negative-binomial overdispersion fit.

- embedding_jl_distortion: the JL random-projection distortion
  audit, made oracle-replayable by drawing the Rademacher sign
  matrix from the Knuth multiplicative hash (sign(d, j) = +-1 from
  the parity of (d*K + j) * 2654435761 mod 2^32 — the wave-24
  SQL-replayable pattern, so "random" is a pure integer expression):
  project to k = 8 dims (y_j = sum_d x_d * s_dj / sqrt(k), folded in
  ascending d), then for all pairs among the 32 lowest vec_ids
  report the squared-distance ratio ||y_a - y_b||^2 / ||x_a - x_b||^2
  (both folds dim-ordered). Emits per-pair ratios — the distortion
  histogram JL bounds talk about.
- events_nbinom_fit: negative-binomial method-of-moments fit to the
  per-user event-count distribution (the standard overdispersion
  model for user activity): mean/variance from exact int sums over
  the bounded per-user table; r = m^2/(v - m), p = m/v — scalar
  expressions only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

JL_K = 8
JL_NVEC = 32
JL_MULT = 2654435761
JL_MOD = 4294967296
JL_DSTRIDE = 10007


# ---------------------------------------------------- embedding_jl_distortion
def _jl_query(k: int = JL_K, nvec: int = JL_NVEC):
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        from ..extras.ann import _to_matrix

        head = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"])
        vid = head.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(vid)[:nvec]
        ids = vid[order]
        x = _to_matrix(head.column("embedding"))[order]
        d = x.shape[1]
        # hash-sign matrix (d x k)
        dd = np.arange(d, dtype=np.int64)[:, None]
        jj = np.arange(k, dtype=np.int64)[None, :]
        h = ((dd * JL_DSTRIDE + jj) * JL_MULT) % JL_MOD
        s = np.where(h % 2 == 0, 1.0, -1.0)
        sk = float(np.sqrt(float(k)))
        # dim-ordered fold: cumsum over d
        y = np.cumsum(x[:, :, None] * s[None, :, :],
                      axis=1)[:, -1, :] / sk
        rows_a, rows_b, rows_r = [], [], []
        for i in range(nvec):
            for j in range(i + 1, nvec):
                dx = x[i] - x[j]
                dy = y[i] - y[j]
                dn = float(np.cumsum(dx * dx)[-1])
                dk = float(np.cumsum(dy * dy)[-1])
                rows_a.append(int(ids[i]))
                rows_b.append(int(ids[j]))
                rows_r.append(dk / dn if dn > 0 else 0.0)
            # pairs fold in (a, b) order on both sides
        return pa.table({
            "vec_a": pa.array(rows_a, type=pa.int64()),
            "vec_b": pa.array(rows_b, type=pa.int64()),
            "ratio": pa.array(rows_r, type=pa.float64()),
        })

    fold = "(acc, x) -> acc + x"
    sql = f"""
    WITH sel AS (
        SELECT vec_id, embedding
        FROM embeddings ORDER BY vec_id LIMIT {nvec}
    ),
    proj AS (
        SELECT vec_id,
               list_transform(generate_series(0, {k - 1}), j ->
                   list_reduce(list_prepend(0.0e0,
                       list_transform(
                           generate_series(1, len(embedding)),
                           d -> CAST(embedding[d] AS DOUBLE)
                                * (CASE WHEN
                                   (((d - 1) * {JL_DSTRIDE} + j)
                                    * {JL_MULT}) % {JL_MOD} % 2 = 0
                                   THEN 1.0e0 ELSE -1.0e0 END))),
                       {fold}) / sqrt({float(k)}e0)) AS y
        FROM sel
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1,
                       (SELECT len(embedding) FROM sel LIMIT 1)),
                   d -> (CAST(ea.embedding[d] AS DOUBLE)
                         - CAST(eb.embedding[d] AS DOUBLE))
                        * (CAST(ea.embedding[d] AS DOUBLE)
                           - CAST(eb.embedding[d] AS DOUBLE)))),
                   {fold}) AS dn,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, {k}),
                   j -> (a.y[j] - b.y[j]) * (a.y[j] - b.y[j]))),
                   {fold}) AS dk
        FROM proj a
        JOIN proj b ON a.vec_id < b.vec_id
        JOIN sel ea ON ea.vec_id = a.vec_id
        JOIN sel eb ON eb.vec_id = b.vec_id
    )
    SELECT vec_a, vec_b,
           CASE WHEN dn > 0 THEN dk / dn ELSE 0.0e0 END AS ratio
    FROM pairs
    """
    return q, sql


# ----------------------------------------------------------- events_nbinom_fit
def _nbinom_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "user_id": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uk, cnt = np.unique(uid, return_counts=True)
            return pa.table({
                "user_id": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("user_id").aggregate([("cnt", "sum")])
            return pa.table({
                "user_id": g.column("user_id").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        c = a["cnt"].to_numpy(np.int64)
        n = int(c.size)
        s = int(c.sum())
        ss = int((c * c).sum())
        nf = float(n)
        m = float(s) / nf
        v = (nf * float(ss) - float(s) * float(s)) / (
            nf * (nf - 1.0))
        over = v > m
        r = m * m / (v - m) if over else 0.0
        p = m / v if over else 1.0
        return pa.table({
            "n_users": pa.array([n], type=pa.int64()),
            "mean_cnt": pa.array([m], type=pa.float64()),
            "var_cnt": pa.array([v], type=pa.float64()),
            "nb_r": pa.array([r], type=pa.float64()),
            "nb_p": pa.array([p], type=pa.float64()),
        })

    sql = """
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS ss
        FROM u
    )
    SELECT n AS n_users,
           CAST(s AS DOUBLE) / nf AS mean_cnt,
           (nf * CAST(ss AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (nf * (nf - 1.0e0)) AS var_cnt,
           CASE WHEN (nf * CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (nf * (nf - 1.0e0))
                     > CAST(s AS DOUBLE) / nf
                THEN (CAST(s AS DOUBLE) / nf)
                     * (CAST(s AS DOUBLE) / nf)
                     / ((nf * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                            / (nf * (nf - 1.0e0))
                        - CAST(s AS DOUBLE) / nf)
                ELSE 0.0e0 END AS nb_r,
           CASE WHEN (nf * CAST(ss AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / (nf * (nf - 1.0e0))
                     > CAST(s AS DOUBLE) / nf
                THEN (CAST(s AS DOUBLE) / nf)
                     / ((nf * CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                            / (nf * (nf - 1.0e0)))
                ELSE 1.0e0 END AS nb_p
    FROM s
    """
    return q, sql


def build_wave79_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_jl_distortion",) + _jl_query()))
    add(*(("events_nbinom_fit",) + _nbinom_query()))
    return queries, oracles
