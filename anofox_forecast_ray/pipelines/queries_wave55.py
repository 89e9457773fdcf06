"""Wave-55 queries: bounce rate, session depth distribution, and
template detection.

- events_bounce_rate: share of 30-min sessions containing exactly one
  event — the classic web-analytics bounce metric, from the existing
  sessionization kernel; two integers and one division.
- events_session_depth_hist: distribution of session sizes in
  power-of-two buckets (bit-length, exact on both sides).
- dedup_prefix64: templated-document detector — docs sharing the same
  first-64-char rolling hash; hash-first (the shuffle moves 8-byte
  prefixes of sha-like polynomial ids, never text), groups with >= 2
  docs reported with their keeper.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..extras.dedup import _BASE, _M64
from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

GAP_US = 1_800_000_000
PREFIX_K = 64


# --------------------------------------------------------- events_bounce_rate
def _bounce_query(gap_us: int = GAP_US):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..kernels.groupfill import sessionize_multi
        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64())}
            )

        def sess_sizes(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending")])
            users = g.column("user_id").to_numpy(zero_copy_only=False)
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            sid = sessionize_multi(users, tus, gap_us)
            chg = np.r_[
                True,
                (users[1:] != users[:-1]) | (sid[1:] != sid[:-1]),
            ]
            starts = np.flatnonzero(chg)
            sizes = np.diff(np.r_[starts, users.size])
            return pa.table(
                {"n_sessions": pa.array([int(sizes.size)],
                                        type=pa.int64()),
                 "n_bounce": pa.array([int((sizes == 1).sum())],
                                      type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            return pa.table(
                {c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                 for c in ("n_sessions", "n_bounce")}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(sess_sizes, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        ns = int(a.column("n_sessions")[0].as_py())
        nb = int(a.column("n_bounce")[0].as_py())
        return pa.table(
            {"n_sessions": pa.array([ns], type=pa.int64()),
             "n_bounce": pa.array([nb], type=pa.int64()),
             "bounce_rate": pa.array(
                 [float(np.float64(nb) / np.float64(ns))],
                 type=pa.float64())}
        )

    sql = f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
    flags AS (
        SELECT user_id, tus,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
    ),
    sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flags
    ),
    sizes AS (
        SELECT CAST(count(*) AS BIGINT) AS sz FROM sess
        GROUP BY user_id, sid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS bounce_rate
    FROM sizes
    """
    return q, sql


# ------------------------------------------------ events_session_depth_hist
def _depth_hist_query(gap_us: int = GAP_US):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..kernels.groupfill import sessionize_multi
        from ..stages.source_rollup import tree_reduce_tables

        POW2 = (np.int64(1) << np.arange(30, dtype=np.int64))

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64())}
            )

        def hist(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending")])
            users = g.column("user_id").to_numpy(zero_copy_only=False)
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            sid = sessionize_multi(users, tus, gap_us)
            chg = np.r_[
                True,
                (users[1:] != users[:-1]) | (sid[1:] != sid[:-1]),
            ]
            starts = np.flatnonzero(chg)
            sizes = np.diff(np.r_[starts, users.size])
            b = np.searchsorted(POW2, sizes, side="right").astype(
                np.int64
            )
            ub, uc = np.unique(b, return_counts=True)
            return pa.table(
                {"bucket": pa.array(np.r_[ub, -1]),
                 "cnt": pa.array(np.r_[uc.astype(np.int64), 0])}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("bucket").aggregate([("cnt", "sum")])
            return pa.table(
                {"bucket": g.column("bucket"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(hist, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[a["bucket"] >= 0].sort_values("bucket")
        return pa.table(
            {"bucket": pa.array(a["bucket"].to_numpy(np.int64)),
             "cnt": pa.array(a["cnt"].to_numpy(np.int64))}
        )

    sql = f"""
    WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
    flags AS (
        SELECT user_id, tus,
               CASE WHEN lag(tus) OVER w IS NULL
                      OR tus - lag(tus) OVER w > {gap_us}
                    THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
    ),
    sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flags
    ),
    sizes AS (
        SELECT CAST(count(*) AS BIGINT) AS sz FROM sess
        GROUP BY user_id, sid
    )
    SELECT CAST(length(printf('%b', sz)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM sizes GROUP BY 1
    """
    return q, sql


# -------------------------------------------------------------- dedup_prefix64
def _prefix_dedup_query(k: int = PREFIX_K):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def prefix_hash(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"hb": pa.array([], type=pa.int64()),
                 "h": pa.array([], type=pa.int64()),
                 "doc_id": pa.array([], type=pa.int64())}
            )
            if "doc_id" not in t.column_names:
                return empty
            ids, hs = [], []
            for did, txt in zip(
                t.column("doc_id").to_pylist(),
                t.column("text").to_pylist(),
            ):
                s = (txt or "")[:k]
                if len(s) < k:
                    continue  # short docs are not template suspects
                h = 0
                for ch in s:  # k is 64: bounded per doc
                    h = (h * _BASE + ord(ch)) % _M64
                ids.append(int(did))
                hs.append(h)
            if not ids:
                return empty
            ha = np.asarray(hs, dtype=np.uint64).view(np.int64)
            hb = ((ha.view(np.uint64) >> np.uint64(56))
                  .astype(np.int64)) % 256
            return pa.table(
                {"hb": pa.array(hb), "h": pa.array(ha),
                 "doc_id": pa.array(
                     np.asarray(ids, dtype=np.int64))}
            )

        def groups(g: pa.Table) -> pa.Table:
            # sort + reduceat == pandas groupby(sort=True) min/count on
            # int64 keys — exact
            h = g.column("h").to_numpy(zero_copy_only=False)
            doc = g.column("doc_id").to_numpy(zero_copy_only=False)
            order = np.argsort(h, kind="stable")
            h_s, d_s = h[order], doc[order]
            starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
            keeper = np.minimum.reduceat(d_s, starts)
            n_docs = np.diff(np.r_[starts, h_s.size])
            keep = n_docs >= 2
            return pa.table(
                {"keeper": pa.array(keeper[keep], type=pa.int64()),
                 "n_docs": pa.array(n_docs[keep].astype(np.int64),
                                    type=pa.int64())}
            )

        ds = (
            read_cols(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(prefix_hash, batch_format="pyarrow")
            .groupby("hb")
            .map_groups(groups, batch_format="pyarrow")
        )
        return _cast(
            ds, {"keeper": pa.int64(), "n_docs": pa.int64()}
        )

    # rolling polynomial over the first k chars as a sequential
    # list_reduce fold (a 64-deep nested expression exceeds DuckDB's
    # binder recursion limit); HUGEINT accumulator keeps every step
    # under 2^84, per-step mod == uint64 wraparound on the engine side
    sql = f"""
    WITH tok AS (
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               generate_subscripts(string_split(text, ''), 1) - 1
                   AS pos,
               unicode(unnest(string_split(text, ''))) AS token
        FROM documents
    ),
    ph AS (
        SELECT doc_id,
               CAST(list_reduce(
                   list_prepend(CAST(0 AS HUGEINT),
                       list(CAST(token AS HUGEINT) ORDER BY pos)),
                   (a, c) -> (a * {_BASE} + c) % {_M64})
                   AS UBIGINT) AS h
        FROM tok WHERE pos < {k}
        GROUP BY doc_id HAVING count(*) = {k}
    )
    SELECT CAST(min(CAST(doc_id AS BIGINT)) AS BIGINT) AS keeper,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM ph GROUP BY h HAVING count(*) >= 2
    """
    return q, sql


def build_wave55_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_bounce_rate",) + _bounce_query()))
    add(*(("events_session_depth_hist",) + _depth_hist_query()))
    add(*(("dedup_prefix64",) + _prefix_dedup_query()))
    return queries, oracles
