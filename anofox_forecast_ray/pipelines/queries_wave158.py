"""Wave-158 queries: CKA between dim-halves, customer similarity.

- embedding_cka_halves: (uncentered) linear Centered-Kernel-
  Alignment between the first and last 32 embedding dimensions —
  the representation-similarity metric, asking whether the two
  halves of the vector encode the same geometry. On integer
  micro-units every Gram entry (X'Y)_ij is an EXACT int64
  (order-free SUM), the three Frobenius norms are HUGEINT square
  sums, and CKA = F_xy / sqrt(F_xx * F_yy) needs exactly one
  division and two sqrts. (Uncentered variant — documented; the
  centered one would force float folds.)
- customer_similar_pairs: the collaborative-filtering primitive —
  the top-10 most similar customer pairs by cosine over monthly
  order-count profiles. Profile cells are bounded (customer x
  month); pair dots come from a month-bucketed self-join (exact
  integers); cosine is one division against integer norms, with
  the (cos desc, ca, cb) tie-break.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

CKA_H = 32
SIM_K = 10
SIM_MIN_ORDERS = 5


# ------------------------------------------------------ embedding_cka_halves
def _cka_query(h: int = CKA_H):
    def q(sf_dir: str):
        import ray.data as rd

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"]
        ).to_pandas().sort_values("vec_id")
        m = np.stack([
            np.round(np.asarray(v, dtype=np.float64)
                     * 1000000.0).astype(np.int64)
            for v in emb["embedding"]])
        x = m[:, :h]
        y = m[:, h:]

        gxy = x.T @ y   # exact int64 (order-free)
        gxx = x.T @ x
        gyy = y.T @ y
        f_xy = int((gxy.astype(object) ** 2).sum())
        f_xx = int((gxx.astype(object) ** 2).sum())
        f_yy = int((gyy.astype(object) ** 2).sum())
        cka = float(f_xy) / (math.sqrt(float(f_xx))
                             * math.sqrt(float(f_yy)))
        return pa.table({
            "n_vecs": pa.array([len(m)], type=pa.int64()),
            "f2_xy": pa.array([float(f_xy)],
                              type=pa.float64()),
            "cka": pa.array([cka], type=pa.float64()),
        })

    sql = f"""
    WITH q AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               CAST(round_even(
                   CAST(unnest(embedding) AS DOUBLE) * 1000000,
                   0) AS BIGINT) AS m
        FROM embeddings
    ),
    x AS (SELECT vec_id, i AS d, m FROM q WHERE i <= {h}),
    y AS (SELECT vec_id, i - {h} AS d, m FROM q
          WHERE i > {h}),
    gxy AS (
        SELECT a.d AS di, b.d AS dj,
               CAST(sum(CAST(a.m AS HUGEINT) * b.m)
                    AS HUGEINT) AS g
        FROM x a JOIN y b ON b.vec_id = a.vec_id
        GROUP BY 1, 2
    ),
    gxx AS (
        SELECT a.d AS di, b.d AS dj,
               CAST(sum(CAST(a.m AS HUGEINT) * b.m)
                    AS HUGEINT) AS g
        FROM x a JOIN x b ON b.vec_id = a.vec_id
        GROUP BY 1, 2
    ),
    gyy AS (
        SELECT a.d AS di, b.d AS dj,
               CAST(sum(CAST(a.m AS HUGEINT) * b.m)
                    AS HUGEINT) AS g
        FROM y a JOIN y b ON b.vec_id = a.vec_id
        GROUP BY 1, 2
    ),
    fro AS (
        SELECT
            (SELECT CAST(sum(g * g) AS DOUBLE) FROM gxy)
                AS f_xy,
            (SELECT CAST(sum(g * g) AS DOUBLE) FROM gxx)
                AS f_xx,
            (SELECT CAST(sum(g * g) AS DOUBLE) FROM gyy)
                AS f_yy
    )
    SELECT (SELECT CAST(count(DISTINCT vec_id) AS BIGINT)
            FROM q) AS n_vecs,
           f_xy AS f2_xy,
           f_xy / (sqrt(f_xx) * sqrt(f_yy)) AS cka
    FROM fro
    """
    return q, sql


# --------------------------------------------------- customer_similar_pairs
def _similar_query(k: int = SIM_K, min_n: int = SIM_MIN_ORDERS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "ckey": pa.array([], type=pa.int64()),
                "month": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "o_custkey" not in t.column_names:
                return empty
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            od = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            key = ckey * np.int64(1 << 16) + month
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "ckey": pa.array(uk // (1 << 16)),
                "month": pa.array(uk % (1 << 16)),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["ckey", "month"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "ckey": g.column("ckey").cast(pa.int64()),
                "month": g.column("month").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        prof = tree_reduce_tables(refs, merge).to_pandas()
        tot = prof.groupby("ckey")["c"].sum()
        keep = set(int(v) for v in tot[tot >= min_n].index)
        prof = prof[prof["ckey"].isin(keep)]

        # norms (integer)
        norm = {}
        vecs = {}
        for ck, g in prof.groupby("ckey"):
            d = {int(m): int(c)
                 for m, c in zip(g["month"], g["c"])}
            vecs[int(ck)] = d
            norm[int(ck)] = sum(v * v for v in d.values())

        # month-bucketed pair dots
        import collections
        dots = collections.Counter()
        for _m, g in prof.groupby("month"):
            rows = sorted(zip(g["ckey"], g["c"]))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    dots[(int(rows[i][0]),
                          int(rows[j][0]))] += (
                        int(rows[i][1]) * int(rows[j][1]))
        scored = []
        for (a, b), d in dots.items():
            cos = float(d) / (math.sqrt(float(norm[a]))
                              * math.sqrt(float(norm[b])))
            scored.append((cos, a, b, d))
        scored.sort(key=lambda r: (-r[0], r[1], r[2]))
        top = scored[:k]
        return pa.table({
            "ca": pa.array([r[1] for r in top],
                           type=pa.int64()),
            "cb": pa.array([r[2] for r in top],
                           type=pa.int64()),
            "dot": pa.array([r[3] for r in top],
                            type=pa.int64()),
            "cosine": pa.array([r[0] for r in top],
                               type=pa.float64()),
        })

    sql = f"""
    WITH prof AS (
        SELECT o_custkey AS ckey,
               year(o_orderdate) * 12 + month(o_orderdate)
                   AS month,
               CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2
    ),
    keep AS (
        SELECT ckey FROM prof GROUP BY ckey
        HAVING sum(c) >= {min_n}
    ),
    p2 AS (
        SELECT prof.* FROM prof
        JOIN keep ON keep.ckey = prof.ckey
    ),
    norms AS (
        SELECT ckey,
               CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT)
                   AS nrm
        FROM p2 GROUP BY ckey
    ),
    dots AS (
        SELECT a.ckey AS ca, b.ckey AS cb,
               CAST(sum(CAST(a.c AS HUGEINT) * b.c)
                    AS BIGINT) AS dot
        FROM p2 a JOIN p2 b
          ON b.month = a.month AND b.ckey > a.ckey
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT d.ca, d.cb, d.dot,
               CAST(d.dot AS DOUBLE)
                   / (sqrt(CAST(na.nrm AS DOUBLE))
                      * sqrt(CAST(nb.nrm AS DOUBLE)))
                   AS cosine
        FROM dots d
        JOIN norms na ON na.ckey = d.ca
        JOIN norms nb ON nb.ckey = d.cb
    ),
    rk AS (
        SELECT *, row_number() OVER (
                   ORDER BY cosine DESC, ca ASC, cb ASC)
                   AS rn
        FROM scored
    )
    SELECT ca, cb, dot, cosine
    FROM rk WHERE rn <= {k}
    ORDER BY ca, cb
    """
    return q, sql


def build_wave158_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_cka_halves",) + _cka_query()))
    add(*(("customer_similar_pairs",) + _similar_query()))
    return queries, oracles
