"""Wave-114 queries: McNemar paired test and Yule's K richness.

- events_mcnemar_error: paired AM/PM design — for every (user,
  active-day) pair, did the user hit an error in the morning half
  (hod < 12), the evening half, both, or neither? The discordant
  counts n10/n01 give McNemar's chi-square (b - c)^2 / (b + c) and
  its continuity-corrected variant — the right test for "is the
  error experience time-of-day dependent?" because each user-day is
  its own control (a plain user-level half split is degenerate here:
  the 15/150 synthetic users are all active enough to hit errors in
  both halves). Per-block (user, day, am, pm) bit partials OR-merge
  (max) before anything moves.
- source_yule_k: Yule's characteristic K per source,
  K = 1e4 * (sum_m m^2 V_m - N) / N^2 = 1e4 * (sum_t c_t^2 - N) / N^2
  — the classic repeat-rate vocabulary-richness constant (scale-free
  in N, unlike TTR/MATTR). Bounded (source, token, cnt) partials
  (codepoint vocabulary), integer square sums (HUGEINT in the
  oracle), one float division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks, corpus_ds
from ._scaffold import read_cols


# ------------------------------------------------------ events_mcnemar_error
def _mcnemar_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def read():
            return read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "key": pa.array([], type=pa.int64()),
                "pre": pa.array([], type=pa.int64()),
                "post": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // 86_400_000_000
            is_pm = ((tus // 3_600_000_000) % 24) >= 12
            uid = t.column("user_id").to_numpy(zero_copy_only=False)
            et = t.column("event_type").to_pandas().to_numpy()
            is_err = et == "error"
            key = uid.astype(np.int64) * np.int64(1 << 24) + day
            uk, inv = np.unique(key, return_inverse=True)
            pre = np.zeros(uk.size, dtype=np.int64)
            post = np.zeros(uk.size, dtype=np.int64)
            np.maximum.at(pre, inv[is_err & ~is_pm], 1)
            np.maximum.at(post, inv[is_err & is_pm], 1)
            return pa.table({
                "key": pa.array(uk.astype(np.int64)),
                "pre": pa.array(pre),
                "post": pa.array(post),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("key").aggregate(
                [("pre", "max"), ("post", "max")])
            return pa.table({
                "key": g.column("key").cast(pa.int64()),
                "pre": g.column("pre_max").cast(pa.int64()),
                "post": g.column("post_max").cast(pa.int64()),
            })

        refs = list(
            read().map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        pre = a["pre"].to_numpy(np.int64)
        post = a["post"].to_numpy(np.int64)
        n11 = int(((pre == 1) & (post == 1)).sum())
        n10 = int(((pre == 1) & (post == 0)).sum())
        n01 = int(((pre == 0) & (post == 1)).sum())
        n00 = int(((pre == 0) & (post == 0)).sum())
        d = n10 - n01
        stat = float(d * d) / float(n10 + n01)
        cc = abs(d) - 1
        stat_cc = float(cc * cc) / float(n10 + n01)
        return pa.table({
            "n11": pa.array([n11], type=pa.int64()),
            "n10": pa.array([n10], type=pa.int64()),
            "n01": pa.array([n01], type=pa.int64()),
            "n00": pa.array([n00], type=pa.int64()),
            "mcnemar": pa.array([stat], type=pa.float64()),
            "mcnemar_cc": pa.array([stat_cc], type=pa.float64()),
        })

    sql = """
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) // 86400000000 AS day,
               CASE WHEN (epoch_us(ts) // 3600000000) % 24 >= 12
                    THEN 1 ELSE 0 END AS pm,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ise
        FROM events
    ),
    u AS (
        SELECT user_id, day,
               max(CASE WHEN ise = 1 AND pm = 0
                        THEN 1 ELSE 0 END) AS pre,
               max(CASE WHEN ise = 1 AND pm = 1
                        THEN 1 ELSE 0 END) AS post
        FROM e GROUP BY user_id, day
    ),
    c AS (
        SELECT
            CAST(sum(CASE WHEN pre = 1 AND post = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS n11,
            CAST(sum(CASE WHEN pre = 1 AND post = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS n10,
            CAST(sum(CASE WHEN pre = 0 AND post = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS n01,
            CAST(sum(CASE WHEN pre = 0 AND post = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS n00
        FROM u
    )
    SELECT n11, n10, n01, n00,
           CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
               / CAST(n10 + n01 AS DOUBLE) AS mcnemar,
           CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) AS DOUBLE)
               / CAST(n10 + n01 AS DOUBLE) AS mcnemar_cc
    FROM c
    """
    return q, sql


# ------------------------------------------------------------ source_yule_k
def _yule_k_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "source": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            src = np.asarray(t.column("source").to_pylist())
            shift = np.int64(1 << 21)
            names, inv = np.unique(src, return_inverse=True)
            keys = (np.repeat(inv, lengths).astype(np.int64)
                    * shift + values.astype(np.int64))
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "source": pa.array(names[uk // shift],
                                   type=pa.string()),
                "token": pa.array(uk % shift, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["source", "token"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "source": g.column("source"),
                "token": g.column("token").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        rows = []
        for src, grp in a.groupby("source", sort=True):
            cnts = [int(c) for c in grp["cnt"]]
            n = sum(cnts)
            s = sum(c * c for c in cnts)
            k = 10000.0 * (float(s - n)
                           / (float(n) * float(n)))
            rows.append((src, len(cnts), n, k))
        return pa.table({
            "source": pa.array([r[0] for r in rows],
                               type=pa.string()),
            "vocab": pa.array([r[1] for r in rows],
                              type=pa.int64()),
            "n_tokens": pa.array([r[2] for r in rows],
                                 type=pa.int64()),
            "yule_k": pa.array([r[3] for r in rows],
                               type=pa.float64()),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    tc AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY source, token
    ),
    agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s
        FROM tc GROUP BY source
    )
    SELECT source, vocab, n AS n_tokens,
           1.0e4 * (CAST(s - n AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               AS yule_k
    FROM agg
    """
    return q, sql


def build_wave114_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_mcnemar_error",) + _mcnemar_query()))
    add(*(("source_yule_k",) + _yule_k_query()))
    return queries, oracles
