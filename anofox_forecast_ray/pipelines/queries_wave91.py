"""Wave-91 queries: silhouette clustering quality and peak-entropy
window localization.

- embedding_silhouette_lite: centroid-based silhouette score for the
  wave-72 k-means clustering (the standard clustering-quality eval,
  with the centroid approximation that keeps it one broadcast pass
  instead of all-pairs): after the same two exact Lloyd steps,
  a(x) = dist to own centroid, b(x) = min dist to any other
  centroid, s = (b - a)/max(a, b). Distances fold dim-ordered
  (sqrt of the squared-distance fold); per-cluster mean s folds in
  vec_id order. Emits per-cluster mean silhouette + sizes.
- doc_peak_entropy_window_w32: which w32 window of each doc has the
  highest Shannon entropy (novelty localization): per-window
  distinct-count entropy with counts integer and one scalar log per
  (window, distinct-token) group; argmax tie-breaks to the earliest
  window. Both sides fold the entropy terms in ascending token
  order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from .queries_wave72 import _kmeans_query, KM_K, KM_SCALE


# ----------------------------------------------- embedding_silhouette_lite
def _silhouette_query(k: int = KM_K, scale: int = KM_SCALE):
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        from ..extras.ann import _to_matrix

        # reuse the exact kmeans2 result (same deterministic steps)
        km_q, _ = _kmeans_query()
        km = km_q(sf_dir).to_pandas()
        cents = km.pivot(index="cluster", columns="dim",
                         values="centroid").to_numpy()
        head = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"])
        vid = head.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(vid)
        x = _to_matrix(head.column("embedding"))[order]
        ids = vid[order]
        diff = x[:, None, :] - cents[None, :, :]
        d2 = np.cumsum(diff * diff, axis=2)[:, :, -1]
        d = np.sqrt(d2)
        assign = np.argmin(d2, axis=1)
        a = d[np.arange(len(x)), assign]
        dother = d2.copy()
        dother[np.arange(len(x)), assign] = np.inf
        b = np.sqrt(dother.min(axis=1))
        s = (b - a) / np.maximum(a, b)
        out_c, out_n, out_s = [], [], []
        for ci in range(k):
            m = assign == ci
            idx = np.flatnonzero(m)
            # vec_id-ordered sequential fold (ids sorted already)
            acc = 0.0
            for ii in idx:
                acc = acc + float(s[ii])
            out_c.append(ci)
            out_n.append(int(m.sum()))
            out_s.append(acc / float(m.sum()) if m.any() else 0.0)
        return pa.table({
            "cluster": pa.array(out_c, type=pa.int64()),
            "n_members": pa.array(out_n, type=pa.int64()),
            "mean_silhouette": pa.array(out_s,
                                        type=pa.float64()),
        })

    # SQL: re-run the two unrolled Lloyd steps (wave-72 CTEs), then
    # the silhouette pass against cent2.
    from .queries_wave72 import _kmeans_query as _kq
    _, km_sql = _kq()
    # extract everything up to the final SELECT of the kmeans oracle
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
    dist3s AS (
        SELECT vec_id, cluster, d2, sqrt(d2) AS dd FROM dist3
    ),
    own AS (
        SELECT vec_id, cluster, dd FROM (
            SELECT vec_id, cluster, dd,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cluster)
                       AS rn
            FROM dist3s)
        WHERE rn = 1
    ),
    oth AS (
        SELECT d.vec_id, sqrt(min(d.d2)) AS b
        FROM dist3 d JOIN own o ON o.vec_id = d.vec_id
        WHERE d.cluster <> o.cluster
        GROUP BY d.vec_id
    ),
    sil AS (
        SELECT own.vec_id, own.cluster,
               (oth.b - own.dd) / GREATEST(own.dd, oth.b) AS s
        FROM own JOIN oth ON oth.vec_id = own.vec_id
    )
    SELECT cluster,
           CAST(count(*) AS BIGINT) AS n_members,
           list_reduce(list_prepend(0.0e0,
               list(s ORDER BY vec_id)), (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) AS mean_silhouette
    FROM sil GROUP BY cluster
    """
    return q, sql


# ---------------------------------------------- doc_peak_entropy_window_w32
def _peak_entropy_query(width: int = 32):
    def q(sf_dir: str):
        def peak(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "best_window": pa.array([], type=pa.int64()),
                "entropy": pa.array([], type=pa.float64()),
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
            keep = lens > 0
            if not keep.any():
                return empty
            ids = [d for d, kk in zip(
                t.column("doc_id").to_pylist(), keep) if kk]
            out_w, out_h = [], []
            for di in np.flatnonzero(keep):
                seg = flat[offs[di]: offs[di + 1]]
                nw = (seg.size + width - 1) // width
                best = (-1.0, -1)
                for w in range(nw):
                    win = seg[w * width: (w + 1) * width]
                    uk, cnt = np.unique(win, return_counts=True)
                    nf = float(win.size)
                    h = 0.0  # ascending-token fold
                    for c in cnt:
                        p = float(int(c)) / nf
                        h = h - p * math.log(p)
                    if h > best[0]:
                        best = (h, w)
                out_h.append(best[0])
                out_w.append(best[1])
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "best_window": pa.array(out_w, type=pa.int64()),
                "entropy": pa.array(out_h, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            peak, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "best_window": pa.int64(),
            "entropy": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    wc AS (
        SELECT doc_id, pos // {width} AS wid, token,
               CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY doc_id, wid, token
    ),
    wn AS (
        SELECT doc_id, wid, CAST(sum(c) AS BIGINT) AS n
        FROM wc GROUP BY doc_id, wid
    ),
    went AS (
        SELECT wc.doc_id, wc.wid,
               -list_reduce(list_prepend(0.0e0,
                   list((CAST(wc.c AS DOUBLE)
                         / CAST(wn.n AS DOUBLE))
                        * ln(CAST(wc.c AS DOUBLE)
                             / CAST(wn.n AS DOUBLE))
                        ORDER BY wc.token)),
                   (a, b) -> a + b) AS h
        FROM wc JOIN wn ON wn.doc_id = wc.doc_id
                       AND wn.wid = wc.wid
        GROUP BY wc.doc_id, wc.wid, wn.n
    ),
    best AS (
        SELECT doc_id, wid, h FROM (
            SELECT doc_id, wid, h,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY h DESC, wid ASC)
                       AS rn
            FROM went)
        WHERE rn = 1
    )
    SELECT doc_id,
           CAST(wid AS BIGINT) AS best_window,
           h AS entropy
    FROM best
    """
    return q, sql


def build_wave91_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_silhouette_lite",) + _silhouette_query()))
    add(*(("doc_peak_entropy_window_w32",)
          + _peak_entropy_query()))
    return queries, oracles
