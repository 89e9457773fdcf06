"""Wave-93 queries: source embedding centroids and trailing-run
padding detection.

- embedding_source_centroid_dist: pairwise L2 distance between the
  per-source embedding centroids (cross-modal join documents ->
  source x embeddings on id; the drift/cluster view of sources in
  embedding space). Centroid sums use the wave-72 fixed-point trick
  (round_even(x * 2^20) int64 — order-free across any partitioning);
  distances fold dim-ordered.
- doc_trailing_run: length of the maximal constant SUFFIX of each
  doc (padding/truncation artifact detector for packed sequences):
  pure integer islands logic; the oracle finds the last island via
  max-position run.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

CD_SCALE = 1 << 20


# -------------------------------------------- embedding_source_centroid_dist
def _centroid_dist_query(scale: int = CD_SCALE):
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.source_rollup import tree_reduce_tables

        # broadcast id -> source (bounded: one row per doc at test
        # scale; at 100 TB this map itself shards — documented)
        docs = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source"])
        ids = np.asarray(
            [int(d) for d in docs.column("doc_id").to_pylist()],
            dtype=np.int64)
        srcs = np.asarray(docs.column("source").to_pylist())
        order = np.argsort(ids)
        ids = ids[order]
        srcs = srcs[order]
        sref = ray.put((ids, srcs))

        class Partial:
            def __init__(self, sref):
                self.ids, self.srcs = ray.get(sref)

            def __call__(self, t: pa.Table) -> pa.Table:
                if ("embedding" not in t.column_names
                        or t.num_rows == 0):
                    return pa.table({
                        "source": pa.array([""],
                                           type=pa.string()),
                        "n": pa.array([0], type=pa.int64()),
                        "s": pa.array(
                            [[0]], type=pa.list_(pa.int64())),
                    })
                x = _to_matrix(t.column("embedding"))
                vid = t.column("vec_id").cast(
                    pa.int64()).to_numpy(zero_copy_only=False)
                idx = np.searchsorted(self.ids, vid)
                src = self.srcs[idx]
                xq = np.round(x * float(scale)).astype(np.int64)
                names, inv = np.unique(src, return_inverse=True)
                rows_s, rows_n, rows_v = [], [], []
                for i, nm in enumerate(names):
                    m = inv == i
                    rows_s.append(str(nm))
                    rows_n.append(int(m.sum()))
                    rows_v.append(xq[m].sum(axis=0).tolist())
                rows_s.append("")
                rows_n.append(0)
                rows_v.append([0])
                return pa.table({
                    "source": pa.array(rows_s, type=pa.string()),
                    "n": pa.array(rows_n, type=pa.int64()),
                    "s": pa.array(rows_v,
                                  type=pa.list_(pa.int64())),
                })

        def merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["source"] != ""]
            out = {"source": [], "n": [], "s": []}
            for src, grp in df.groupby("source", sort=True):
                out["source"].append(src)
                out["n"].append(int(grp["n"].sum()))
                mat = np.asarray(
                    [np.asarray(v, dtype=np.int64)
                     for v in grp["s"]])
                out["s"].append(mat.sum(axis=0).tolist())
            out["source"].append("")
            out["n"].append(0)
            out["s"].append([0])
            return pa.table({
                "source": pa.array(out["source"],
                                   type=pa.string()),
                "n": pa.array(out["n"], type=pa.int64()),
                "s": pa.array(out["s"],
                              type=pa.list_(pa.int64())),
            })

        refs = list(
            read_cols(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(Partial, batch_format="pyarrow",
                         concurrency=2,
                         fn_constructor_args=(sref,))
            .to_arrow_refs()
        )
        agg = tree_reduce_tables(refs, merge).to_pandas()
        agg = agg[agg["source"] != ""].sort_values(
            "source").reset_index(drop=True)
        cents = {}
        for r in agg.itertuples():
            s = np.asarray(r.s, dtype=np.int64)
            cents[r.source] = (s.astype(np.float64)
                               / float(int(r.n))
                               / float(scale))
        names = sorted(cents)
        out_a, out_b, out_d = [], [], []
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                diff = cents[a] - cents[b]
                d2 = float(np.cumsum(diff * diff)[-1])
                out_a.append(a)
                out_b.append(b)
                out_d.append(math.sqrt(d2))
        return pa.table({
            "s1": pa.array(out_a, type=pa.string()),
            "s2": pa.array(out_b, type=pa.string()),
            "dist": pa.array(out_d, type=pa.float64()),
        })

    sql = f"""
    WITH dims AS (
        SELECT d.source,
               unnest(e.embedding) AS x,
               generate_subscripts(e.embedding, 1) AS dim
        FROM embeddings e
        JOIN documents d ON CAST(d.doc_id AS BIGINT) = e.vec_id
    ),
    cent AS (
        SELECT source, dim,
               CAST(sum(CAST(round_even(
                   CAST(x AS DOUBLE) * {float(scale)}e0, 0)
                   AS BIGINT)) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dims GROUP BY source, dim
    ),
    cv AS (
        SELECT source,
               list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                    / {float(scale)}e0 ORDER BY dim) AS c
        FROM cent GROUP BY source
    )
    SELECT a.source AS s1, b.source AS s2,
           sqrt(list_reduce(list_prepend(0.0e0, list_transform(
               generate_series(1, len(a.c)),
               i -> (a.c[i] - b.c[i]) * (a.c[i] - b.c[i]))),
               (x, y) -> x + y)) AS dist
    FROM cv a JOIN cv b ON a.source < b.source
    """
    return q, sql


# ---------------------------------------------------------------- doc_trailing_run
def _trailing_run_query():
    def q(sf_dir: str):
        def trail(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "trail_token": pa.array([], type=pa.int64()),
                "trail_len": pa.array([], type=pa.int64()),
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
            out_t, out_l, out_n = [], [], []
            for di in np.flatnonzero(keep):
                seg = flat[offs[di]: offs[di + 1]]
                last = seg[-1]
                neq = np.flatnonzero(seg != last)
                tl = (seg.size if neq.size == 0
                      else seg.size - 1 - int(neq[-1]))
                out_t.append(int(last))
                out_l.append(int(tl))
                out_n.append(int(seg.size))
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(out_n, type=pa.int64()),
                "trail_token": pa.array(out_t, type=pa.int64()),
                "trail_len": pa.array(out_l, type=pa.int64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            trail, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "trail_token": pa.int64(),
            "trail_len": pa.int64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY doc_id
    ),
    lastv AS (
        SELECT t.doc_id, t.token AS lt
        FROM tok t JOIN tl ON tl.doc_id = t.doc_id
        WHERE t.pos = tl.n - 1
    ),
    brk AS (
        SELECT t.doc_id,
               CAST(max(t.pos) AS BIGINT) AS last_neq
        FROM tok t JOIN lastv lv ON lv.doc_id = t.doc_id
        WHERE t.token <> lv.lt
        GROUP BY t.doc_id
    )
    SELECT tl.doc_id, tl.n AS n_tok,
           CAST(lv.lt AS BIGINT) AS trail_token,
           CAST(CASE WHEN brk.last_neq IS NULL THEN tl.n
                ELSE tl.n - 1 - brk.last_neq END AS BIGINT)
               AS trail_len
    FROM tl
    JOIN lastv lv ON lv.doc_id = tl.doc_id
    LEFT JOIN brk ON brk.doc_id = tl.doc_id
    """
    return q, sql


def build_wave93_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_source_centroid_dist",)
          + _centroid_dist_query()))
    add(*(("doc_trailing_run",) + _trailing_run_query()))
    return queries, oracles
