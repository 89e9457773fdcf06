"""Wave-47 queries: exact 1-NN evaluation and snippet extraction.

- embedding_1nn_accuracy: leave-one-out 1-nearest-neighbor label
  accuracy over the embeddings table — the standard representation-
  quality eval. Distances are EXACT: vectors quantize to integer
  micro-units (round_even(x*1e6)) so squared Euclidean distances are
  int64 and the argmin (tie: smaller vec_id) cannot float-flip between
  engine and oracle. Engine shape: per-block queries vs a ray.put
  broadcast of the (bounded) quantized matrix — the brute-force eval
  the ANN baseline uses.
- doc_best_snippet_w32: the highest-scoring 32-token sliding window
  per doc for the fixed BM25 query-token set (hits = query tokens in
  window; tie: earliest start) — the snippet-extraction step of a
  search pipeline. Engine: one cumsum per doc and a windowed
  difference; exact integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_wave29 import QUERY_TOKENS

SNIP_W = 32


# ----------------------------------------------------- embedding_1nn_accuracy
def _one_nn_query():
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..extras.ann import _to_matrix
        from ..stages.source_rollup import tree_reduce_tables

        import pyarrow.parquet as pq

        # reference matrix: bounded eval table, quantized to ints,
        # broadcast once (the ANN brute-force pattern)
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
        mat, vec_ids, labels = mat[order], vec_ids[order], labels[order]
        ref_ref = ray.put((mat, vec_ids, labels))

        def score(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"n": pa.array([], type=pa.int64()),
                 "correct": pa.array([], type=pa.int64())}
            )
            if "embedding" not in t.column_names:
                return empty
            m, vids, labs = ray.get(ref_ref)
            q_mat = np.round(
                _to_matrix(t.column("embedding")) * 1_000_000.0
            ).astype(np.int64)
            q_ids = np.asarray(t.column("vec_id").to_pylist(),
                               dtype=np.int64)
            q_lab = np.asarray(t.column("label").to_pylist(),
                               dtype=np.int64)
            correct = 0
            # exact int64 distances; blocks are small so the O(b*N)
            # loop over query rows with a vectorized inner is fine
            for i in range(q_mat.shape[0]):
                d = m - q_mat[i]
                dist = (d * d).sum(axis=1)
                dist[np.searchsorted(vids, q_ids[i])] = (
                    np.int64(1) << 62
                )  # leave-one-out
                j = int(np.argmin(dist))  # ties: first = smallest id
                if labs[j] == q_lab[i]:
                    correct += 1
            return pa.table(
                {"n": pa.array([q_mat.shape[0]], type=pa.int64()),
                 "correct": pa.array([correct], type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            return pa.table(
                {"n": pa.array(
                    [int(t.column("n").to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64()),
                 "correct": pa.array(
                     [int(t.column("correct").to_numpy(
                         zero_copy_only=False).sum())],
                     type=pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
            .map_batches(score, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        n = int(a.column("n")[0].as_py())
        c = int(a.column("correct")[0].as_py())
        return pa.table(
            {"n": pa.array([n], type=pa.int64()),
             "correct": pa.array([c], type=pa.int64()),
             "accuracy": pa.array(
                 [float(np.float64(c) / np.float64(n))],
                 type=pa.float64())}
        )

    sql = """
    WITH q AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               CAST(round_even(
                   CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
                   AS BIGINT) AS m
        FROM embeddings
    ),
    d AS (
        -- integer squared distances: the per-dim sum is order-free,
        -- so a plain SUM over the unnest join is exact
        SELECT a.vec_id AS qid, a.label AS qlab,
               b.vec_id AS rid, b.label AS rlab,
               CAST(sum((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS dist
        FROM q a JOIN q b ON a.i = b.i AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, a.label, b.vec_id, b.label
    ),
    nn AS (
        SELECT qid, qlab, rlab,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY dist, rid) AS rk
        FROM d
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN qlab = rlab THEN 1 ELSE 0 END)
                AS BIGINT) AS correct,
           CAST(sum(CASE WHEN qlab = rlab THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
    FROM nn WHERE rk = 1
    """
    return q, sql


# ------------------------------------------------------- doc_best_snippet_w32
def _snippet_query(w: int = SNIP_W):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        qtok = np.asarray(sorted(QUERY_TOKENS), dtype=np.int64)

        def snippet(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "start": pa.array([], type=pa.int64()),
                 "hits": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            hit = np.isin(v, qtok).astype(np.int64)
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            out_id, out_s, out_h = [], [], []
            off = 0
            for did, ln in zip(ids, lens):
                h = hit[off:off + ln]
                off += ln
                if ln == 0:
                    continue
                if ln <= w:
                    out_id.append(int(did))
                    out_s.append(0)
                    out_h.append(int(h.sum()))
                    continue
                c = np.concatenate(([0], np.cumsum(h)))
                wins = c[w:] - c[:-w]  # hits per start 0..ln-w
                best = int(np.argmax(wins))  # ties: earliest
                out_id.append(int(did))
                out_s.append(best)
                out_h.append(int(wins[best]))
            return pa.table(
                {"doc_id": pa.array(out_id, type=pa.int64()),
                 "start": pa.array(out_s, type=pa.int64()),
                 "hits": pa.array(out_h, type=pa.int64())}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(snippet,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "start": pa.int64(),
             "hits": pa.int64()},
        )

    toks = ", ".join(str(t) for t in sorted(QUERY_TOKENS))
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    lens AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
    starts AS (
        SELECT t.doc_id, t.pos AS start
        FROM tok t JOIN lens l ON l.doc_id = t.doc_id
        WHERE t.pos <= l.n - {w} OR t.pos = 0
    ),
    scored AS (
        SELECT s.doc_id, s.start,
               CAST((SELECT count(*) FROM tok u
                     WHERE u.doc_id = s.doc_id
                       AND u.pos >= s.start
                       AND u.pos < s.start + {w}
                       AND u.token IN ({toks})) AS BIGINT) AS hits
        FROM starts s
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(start AS BIGINT) AS start,
           CAST(hits AS BIGINT) AS hits
    FROM (
        SELECT doc_id, start, hits,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, start) AS rk
        FROM scored
    ) WHERE rk = 1
    """
    return q, sql


def build_wave47_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_1nn_accuracy",) + _one_nn_query()))
    add(*(("doc_best_snippet_w32",) + _snippet_query(SNIP_W)))
    return queries, oracles
