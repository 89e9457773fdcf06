"""Wave-29 queries: BM25 ranked retrieval and CDC latest-state
compaction.

- bm25_topk: Okapi BM25 (k1=1.2, b=0.75) over the token corpus for a
  fixed 8-token query. Two bounded passes: (N, sum_dl, df_t) partials
  tree-reduced, then a stateless scoring scan with per-block top-k
  partials merged by the same kernel — corpus statistics are broadcast
  as plain Python floats inside the closure, never a shuffle. Float
  discipline: every division is a single f64 op of exact ints, idf uses
  scalar math.log (libm == DuckDB ln), and the 8-term score sum is a
  left fold in token order; the oracle replays it with list_reduce.
  Adding tf=0 terms (engine) vs skipping them (oracle) is bitwise
  neutral because x + 0.0 == x for the non-negative scores here.
- events_latest_state: change-data-capture compaction — the latest
  (ts, event_type, value) per user. Per-block latest partials collapse
  BEFORE the shuffle (one row per (block, user)), then a hash-bucket
  kernel takes the global argmax by (ts, event_id); at 100 TB only
  per-block latest rows ever move.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks
from ._scaffold import read_cols

K1 = 1.2
B = 0.75
QUERY_TOKENS = [98, 100, 102, 106, 107, 113, 118, 121]  # b d f j k q v y (rarest)
TOP_K = 25
_MIX = np.uint64(0x9E3779B97F4A7C15)


# ------------------------------------------------------------- bm25_topk
def _bm25_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..corpus import tokens_from_text_batch
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        qtok = np.asarray(sorted(QUERY_TOKENS), dtype=np.int64)

        def read():
            return read_cols(sf_dir, "documents", ["doc_id", "source", "text"]).map_batches(tokens_from_text_batch, batch_format="pyarrow")

        def stats_partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"stat": pa.array([], type=pa.string()),
                 "v": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            starts = np.concatenate(
                ([0], np.cumsum(lengths))
            )[:-1].astype(np.int64)
            names = ["N", "sum_dl"]
            vals = [int(lengths.size), int(lengths.sum())]
            for tk in qtok:
                if values.size:
                    mask = (values.astype(np.int64) == tk).astype(
                        np.int64
                    )
                    per_doc = np.add.reduceat(mask, starts)
                    per_doc[lengths == 0] = 0
                    df = int((per_doc > 0).sum())
                else:
                    df = 0
                names.append(f"df_{int(tk)}")
                vals.append(df)
            return pa.table(
                {"stat": pa.array(names, type=pa.string()),
                 "v": pa.array(np.asarray(vals, dtype=np.int64))}
            )

        def stats_merge(t: pa.Table) -> pa.Table:
            g = t.group_by("stat").aggregate([("v", "sum")])
            return pa.table(
                {"stat": g.column("stat"),
                 "v": g.column("v_sum").cast(pa.int64())}
            )

        srefs = list(
            read().map_batches(stats_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        st = tree_reduce_tables(srefs, stats_merge).to_pandas()
        sd = dict(zip(st["stat"], st["v"].astype(int)))
        n_docs = sd["N"]
        avgdl = float(sd["sum_dl"]) / float(n_docs)
        idf = {
            int(tk): math.log(
                (float(n_docs - sd[f"df_{int(tk)}"]) + 0.5)
                / (float(sd[f"df_{int(tk)}"]) + 0.5)
            )
            for tk in qtok
        }

        def score_topk(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "dl": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.float64())}
            )
            if "tokens" not in t.column_names:
                # merge pass: re-rank already-scored partials
                if "score" not in t.column_names:
                    return empty
                df = t.to_pandas()
                df = df.sort_values(
                    ["score", "doc_id"], ascending=[False, True]
                ).head(TOP_K)
                return pa.Table.from_pandas(df, preserve_index=False)
            values, lengths = _flat_tokens(t)
            if lengths.size == 0:
                return empty
            starts = np.concatenate(
                ([0], np.cumsum(lengths))
            )[:-1].astype(np.int64)
            dl = lengths.astype(np.int64)
            den_norm = K1 * (1.0 - B + B * (dl.astype(np.float64)
                                            / avgdl))
            score = np.zeros(dl.size, dtype=np.float64)
            v64 = values.astype(np.int64) if values.size else values
            for tk in qtok:  # left fold in token order
                if values.size:
                    mask = (v64 == tk).astype(np.int64)
                    tf = np.add.reduceat(mask, starts)
                    tf[lengths == 0] = 0
                else:
                    tf = np.zeros(dl.size, dtype=np.int64)
                tff = tf.astype(np.float64)
                score = score + (idf[int(tk)] * (tff * (K1 + 1.0))
                                 / (tff + den_norm))
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            df = (
                __import__("pandas").DataFrame(
                    {"doc_id": ids, "dl": dl, "score": score}
                )
                .sort_values(["score", "doc_id"],
                             ascending=[False, True])
                .head(TOP_K)
            )
            return pa.Table.from_pandas(df, preserve_index=False)

        prefs = list(
            read().map_batches(score_topk, batch_format="pyarrow")
            .to_arrow_refs()
        )
        merged = tree_reduce_tables(prefs, score_topk).to_pandas()
        merged = merged.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(TOP_K).reset_index(drop=True)
        merged["rk"] = np.arange(1, len(merged) + 1, dtype=np.int64)
        return pa.table(
            {"rk": pa.array(merged["rk"].to_numpy(np.int64)),
             "doc_id": pa.array(merged["doc_id"].to_numpy(np.int64)),
             "dl": pa.array(merged["dl"].to_numpy(np.int64)),
             "score": pa.array(merged["score"].to_numpy(np.float64),
                               type=pa.float64())}
        )

    toks = ", ".join(str(t) for t in sorted(QUERY_TOKENS))
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM tok WHERE token IN ({toks})
        GROUP BY doc_id, token
    ),
    dfq AS (
        SELECT token, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY token
    ),
    terms AS (
        SELECT t.doc_id, t.token,
               ln((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
                  / (CAST(d.df AS DOUBLE) + 0.5))
               * (CAST(t.tf AS DOUBLE) * ({K1!r} + 1.0))
               / (CAST(t.tf AS DOUBLE)
                  + {K1!r} * (1.0 - {B!r}
                      + {B!r} * (CAST(dd.n_chars AS DOUBLE)
                                 / (CAST(s.sum_dl AS DOUBLE)
                                    / CAST(s.n_docs AS DOUBLE)))))
                   AS term
        FROM tf t
        JOIN dfq d ON d.token = t.token
        JOIN documents dd ON CAST(dd.doc_id AS VARCHAR) = t.doc_id
        CROSS JOIN stats s
    ),
    scores AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(term ORDER BY token)),
                   (a, b) -> a + b) AS score
        FROM terms GROUP BY doc_id
    ),
    allsc AS (
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               CAST(d.n_chars AS BIGINT) AS dl,
               COALESCE(s.score, 0.0) AS score
        FROM documents d
        LEFT JOIN scores s ON s.doc_id = CAST(d.doc_id AS VARCHAR)
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                AS BIGINT) AS rk,
           doc_id, dl, score
    FROM allsc
    ORDER BY score DESC, doc_id
    LIMIT {TOP_K}
    """
    return q, sql


# ----------------------------------------------- events_latest_state
def _latest_state_query(n_buckets: int = 128):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"bucket": pa.array([], type=pa.int64()),
                 "user_id": pa.array([], type=pa.int64()),
                 "ts_us": pa.array([], type=pa.int64()),
                 "event_id": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "cents": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            df = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "ts_us": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type"),
                 "cents": pa.array(cents)}
            ).to_pandas()
            # per-block latest per user: argmax by (ts_us, event_id)
            df = df.sort_values(["user_id", "ts_us", "event_id"])
            df = df.groupby("user_id", sort=False).tail(1)
            u = df["user_id"].to_numpy(np.int64)
            b = (((u.astype(np.uint64) * _MIX) >> np.uint64(48))
                 .astype(np.int64)) % n_buckets
            df.insert(0, "bucket", b)
            return pa.Table.from_pandas(df, preserve_index=False)

        def bucket_latest(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("ts_us", "ascending"),
                           ("event_id", "ascending")])
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ends = np.r_[np.flatnonzero(u[1:] != u[:-1]),
                         u.size - 1]
            return g.take(pa.array(ends, type=pa.int64())).select(
                ["user_id", "ts_us", "event_id", "event_type",
                 "cents"]
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type",
                         "value"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_latest, batch_format="pyarrow")
        )
        from .queries import _cast

        return _cast(
            ds,
            {"user_id": pa.int64(), "ts_us": pa.int64(),
             "event_id": pa.int64(), "event_type": pa.string(),
             "cents": pa.int64()},
        )

    sql = """
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(event_id AS BIGINT) AS event_id,
           event_type,
           CAST(round_even(value * 100, 0) AS BIGINT) AS cents
    FROM (
        SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """
    return q, sql


def build_wave29_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("bm25_topk",) + _bm25_query()))
    add(*(("events_latest_state",) + _latest_state_query()))
    return queries, oracles
