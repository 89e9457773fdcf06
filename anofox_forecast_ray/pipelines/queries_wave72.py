"""Wave-72 queries: distributed k-means (2 exact Lloyd steps) and
mean-crossing rate.

- embedding_kmeans2: TWO Lloyd iterations of k-means (k = 4) over
  the embeddings table, made bitwise-checkable end to end:
  * assignment — distances fold over dims in ascending order
    (engine: cumsum axis=1; oracle: list_reduce over the 64-term
    list); argmin tie-breaks to the lowest cluster id on both sides;
  * update — member coordinates are quantized once to int64
    fixed-point (round_even(x * 2^20)), so per-cluster per-dim sums
    are EXACT integers (order-free, tree-reduced across blocks; no
    ordered float fold is ever needed in the distributed step);
    the new centroid is the one float expression S/n/2^20.
  Init = the k lowest vec_ids' embeddings. Emits final cluster
  sizes and a per-dim centroid table. This is the canonical
  broadcast-assign + integer-partial-update distributed k-means;
  at scale only (k x dim) ints cross the wire per block.
- doc_mean_crossings: mean-crossing count of the token series (a
  standard signal feature next to doc_turning_points): with z_t =
  n*y_t - S (integer), a crossing is z_t * z_{t+1} < 0 — pure int64
  comparisons; rate = crossings/(n-1) is the one division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

KM_K = 4
KM_ITERS = 2
KM_SCALE = 1 << 20


# ---------------------------------------------------------- embedding_kmeans2
def _kmeans_query(k: int = KM_K, iters: int = KM_ITERS,
                  scale: int = KM_SCALE):
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.source_rollup import tree_reduce_tables

        src = read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
        # init: the k lowest vec_ids (deterministic, order-free)
        import pyarrow.parquet as pq
        head = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"])
        vid = head.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(vid)[:k]
        cents = _to_matrix(head.column("embedding"))[order]
        d = cents.shape[1]

        def step(cents):
            cref = ray.put(cents)

            def partial(t: pa.Table) -> pa.Table:
                if ("embedding" not in t.column_names
                        or t.num_rows == 0):
                    return pa.table({
                        "cluster": pa.array([], type=pa.int64()),
                        "n": pa.array([], type=pa.int64()),
                        "s": pa.array(
                            [], type=pa.list_(pa.int64())),
                    })
                x = _to_matrix(t.column("embedding"))
                c = ray.get(cref)
                # dim-ordered sequential fold of squared diffs
                diff = x[:, None, :] - c[None, :, :]
                dist = np.cumsum(diff * diff, axis=2)[:, :, -1]
                assign = np.argmin(dist, axis=1)  # lowest id wins
                xq = np.round(x * float(scale)).astype(np.int64)
                rows = []
                for ci in range(len(c)):
                    m = assign == ci
                    if not m.any():
                        continue
                    rows.append((ci, int(m.sum()),
                                 xq[m].sum(axis=0).tolist()))
                return pa.table({
                    "cluster": pa.array(
                        [r[0] for r in rows], type=pa.int64()),
                    "n": pa.array([r[1] for r in rows],
                                  type=pa.int64()),
                    "s": pa.array([r[2] for r in rows],
                                  type=pa.list_(pa.int64())),
                })

            def merge(t: pa.Table) -> pa.Table:
                df = t.to_pandas()
                out = {"cluster": [], "n": [], "s": []}
                for ci, grp in df.groupby("cluster", sort=True):
                    out["cluster"].append(int(ci))
                    out["n"].append(int(grp["n"].sum()))
                    mat = np.asarray(
                        [np.asarray(v, dtype=np.int64)
                         for v in grp["s"]])
                    out["s"].append(mat.sum(axis=0).tolist())
                return pa.table({
                    "cluster": pa.array(out["cluster"],
                                        type=pa.int64()),
                    "n": pa.array(out["n"], type=pa.int64()),
                    "s": pa.array(out["s"],
                                  type=pa.list_(pa.int64())),
                })

            refs = list(src.map_batches(
                partial, batch_format="pyarrow").to_arrow_refs())
            agg = tree_reduce_tables(refs, merge).to_pandas()
            agg = agg.sort_values("cluster").reset_index(drop=True)
            new = cents.copy()
            counts = np.zeros(len(cents), dtype=np.int64)
            for r in agg.itertuples():
                ci = int(r.cluster)
                counts[ci] = int(r.n)
                s = np.asarray(r.s, dtype=np.int64)
                new[ci] = (s.astype(np.float64)
                           / float(int(r.n)) / float(scale))
            return new, counts

        counts = np.zeros(k, dtype=np.int64)
        for _ in range(iters):
            cents, counts = step(cents)
        rows_c, rows_d, rows_v, rows_n = [], [], [], []
        for ci in range(k):
            for di in range(d):
                rows_c.append(ci)
                rows_d.append(di)
                rows_v.append(float(cents[ci, di]))
                rows_n.append(int(counts[ci]))
        return pa.table({
            "cluster": pa.array(rows_c, type=pa.int64()),
            "dim": pa.array(rows_d, type=pa.int64()),
            "centroid": pa.array(rows_v, type=pa.float64()),
            "n_members": pa.array(rows_n, type=pa.int64()),
        })

    # SQL: two unrolled Lloyd steps. Distances fold per (vec,
    # cluster) over the 64-dim list in ascending dim order.
    def assign_cte(cent_tbl: str, tag: str) -> str:
        return f"""
    dist{tag} AS (
        SELECT e.vec_id, c.cluster,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, len(e.embedding)),
                   i -> (CAST(e.embedding[i] AS DOUBLE)
                         - c.cent[i])
                        * (CAST(e.embedding[i] AS DOUBLE)
                           - c.cent[i]))),
                   (a, b) -> a + b) AS d2
        FROM embeddings e CROSS JOIN {cent_tbl} c
    ),
    asg{tag} AS (
        SELECT vec_id, cluster FROM (
            SELECT vec_id, cluster,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster) AS rn
            FROM dist{tag})
        WHERE rn = 1
    ),
    upd{tag} AS (
        SELECT a.cluster,
               CAST(count(*) AS BIGINT) AS n,
               u.d AS dim,
               CAST(sum(CAST(round_even(
                   CAST(u.x AS DOUBLE) * {float(scale)}e0, 0)
                   AS BIGINT)) AS BIGINT) AS s
        FROM (SELECT vec_id, unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS d
              FROM embeddings) u
        JOIN asg{tag} a ON a.vec_id = u.vec_id
        GROUP BY a.cluster, u.d
    ),
    cent{tag} AS (
        SELECT cluster,
               list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                    / {float(scale)}e0 ORDER BY dim) AS cent,
               max(n) AS n
        FROM upd{tag} GROUP BY cluster
    )"""

    sql = f"""
    WITH init AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
               list_transform(embedding,
                              v -> CAST(v AS DOUBLE)) AS cent
        FROM embeddings ORDER BY vec_id LIMIT {k}
    ),{assign_cte("init", "1")},{assign_cte("cent1", "2")}
    SELECT c.cluster,
           dd.d - 1 AS dim,
           c.cent[CAST(dd.d AS INTEGER)] AS centroid,
           CAST(c.n AS BIGINT) AS n_members
    FROM cent2 c
    CROSS JOIN (SELECT unnest(generate_series(1,
        (SELECT max(len(embedding)) FROM embeddings))) AS d) dd
    """
    return q, sql


# -------------------------------------------------------- doc_mean_crossings
def _crossings_query():
    def q(sf_dir: str):
        def crossings(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "n_crossings": pa.array([], type=pa.int64()),
                "rate": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens >= 2
            if not keep.any():
                return empty
            ids = [d for d, kk in zip(
                t.column("doc_id").to_pylist(), keep) if kk]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            tot = int(dlens.sum())
            g = np.repeat(np.arange(nd), dlens)
            pos = (np.arange(tot)
                   - np.repeat(np.cumsum(dlens) - dlens, dlens))
            y = flat[starts[g] + pos]
            # per-doc sums for the n-scaled centering z = n*y - S
            s = np.bincount(g, weights=y, minlength=nd).astype(
                np.int64)
            z = dlens[g] * y - s[g]
            nxt = np.r_[z[1:], np.int64(0)]
            valid = pos < (dlens[g] - 1)
            # sign comparison, not z*nxt (the product can overflow
            # int64 at the 2^21 token envelope)
            cross = (((z > 0) & (nxt < 0))
                     | ((z < 0) & (nxt > 0))) & valid
            nc = np.bincount(
                g, weights=cross, minlength=nd).astype(np.int64)
            rate = (nc.astype(np.float64)
                    / (dlens - 1).astype(np.float64))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                "n_crossings": pa.array(nc),
                "rate": pa.array(rate, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            crossings, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "n_crossings": pa.int64(),
            "rate": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    st AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id HAVING count(*) >= 2
    ),
    z AS (
        SELECT t.doc_id, t.pos, st.n,
               st.n * t.token - st.s AS zv,
               lead(st.n * t.token - st.s)
                   OVER (PARTITION BY t.doc_id ORDER BY t.pos)
                   AS zn
        FROM tok t JOIN st ON st.doc_id = t.doc_id
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_tok,
           CAST(sum(CASE WHEN zn IS NOT NULL
                          AND ((zv > 0 AND zn < 0)
                               OR (zv < 0 AND zn > 0))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
           CAST(sum(CASE WHEN zn IS NOT NULL
                          AND ((zv > 0 AND zn < 0)
                               OR (zv < 0 AND zn > 0))
                    THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(max(n) - 1 AS DOUBLE) AS rate
    FROM z GROUP BY doc_id
    """
    return q, sql


def build_wave72_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_kmeans2",) + _kmeans_query()))
    add(*(("doc_mean_crossings",) + _crossings_query()))
    return queries, oracles
