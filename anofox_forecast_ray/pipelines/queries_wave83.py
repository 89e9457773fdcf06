"""Wave-83 queries: two-hop compaction chain, crest factor, and
decayed user frequency.

- rollup_compact_chain_w128: the north-star retention chain raw ->
  w8 -> w32 -> w128 run as TWO compaction hops over rollup rows
  (never touching raw tokens after the first tier), oracled by the
  direct w128 SQL — proves the fine-to-coarse composition is
  bitwise-lossless through a multi-level chain, not just one hop
  (extends rollup_compact_w32; tier nesting invariant, CLAUDE.md).
- doc_crest_factor: crest factor max|y| / rms(y) per doc (the
  peak-detection scalar from signal practice): integer max and
  integer moment sums; rms = sqrt(SS/n); one division chain.
- events_decayed_frequency: exponentially time-decayed activity
  score per user, score = sum_d cnt_d * 0.9^age_d over the bounded
  (user, day) cells with age = last_day - d — pow(0.9, k) is a
  shared-libm scalar and the fold runs in ascending day order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import (ROLLUP_SCHEMA, SQL_TOK, _cast,
                      _num_read_blocks, _rollup_query, corpus_ds)
from ._scaffold import read_cols

DECAY = 0.9


# ----------------------------------------------- rollup_compact_chain_w128
def _compact_chain_query():
    from ..config import TierSpec

    def q(sf_dir: str):
        from ..stages.rollup import (make_compact_fn,
                                     make_tier_rollup_fn)

        fine = (TierSpec("w8", 8),)
        ds = (
            corpus_ds(sf_dir)
            .map_batches(make_tier_rollup_fn(fine),
                         batch_format="pyarrow")
            .map_batches(make_compact_fn(4, "w32"),
                         batch_format="pyarrow")
            .map_batches(make_compact_fn(4, "w128"),
                         batch_format="pyarrow")
        )
        return _cast(ds, ROLLUP_SCHEMA)

    _, w128_sql = _rollup_query(128)
    return q, w128_sql


# ------------------------------------------------------------ doc_crest_factor
def _crest_query():
    def q(sf_dir: str):
        def crest(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "peak": pa.array([], type=pa.int64()),
                "crest": pa.array([], type=pa.float64()),
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
            keep = lens >= 1
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            g = np.repeat(np.arange(nd), dlens)
            tot = int(dlens.sum())
            pos = (np.arange(tot)
                   - np.repeat(np.cumsum(dlens) - dlens, dlens))
            y = flat[starts[g] + pos]
            ay = np.abs(y)
            peak = np.zeros(nd, dtype=np.int64)
            np.maximum.at(peak, g, ay)
            ss = np.bincount(g, weights=y * y,
                             minlength=nd).astype(np.int64)
            rms = np.sqrt(ss.astype(np.float64)
                          / dlens.astype(np.float64))
            cr = np.where(rms > 0,
                          peak.astype(np.float64)
                          / np.where(rms > 0, rms, 1.0), 0.0)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                "peak": pa.array(peak),
                "crest": pa.array(cr, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            crest, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "peak": pa.int64(),
            "crest": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    st AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(abs(token)) AS BIGINT) AS peak,
               CAST(sum(token * token) AS BIGINT) AS ss
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n AS n_tok, peak,
           CASE WHEN ss > 0
                THEN CAST(peak AS DOUBLE)
                     / sqrt(CAST(ss AS DOUBLE)
                            / CAST(n AS DOUBLE))
                ELSE 0.0e0 END AS crest
    FROM st
    """
    return q, sql


# -------------------------------------------------- events_decayed_frequency
def _decayed_freq_query(decay: float = DECAY):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "user_id": pa.array([], type=pa.int64()),
                    "day": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // 86_400_000_000
            key = uid * 100000 + day
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "user_id": pa.array(uk // 100000),
                "day": pa.array(uk % 100000),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["user_id", "day"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "user_id": g.column("user_id").cast(pa.int64()),
                "day": g.column("day").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        last_day = int(a["day"].max())
        a = a.sort_values(["user_id", "day"]).reset_index(
            drop=True)
        out_u, out_s, out_n = [], [], []
        for uid, grp in a.groupby("user_id", sort=True):
            score = 0.0
            n = 0
            for r in grp.itertuples():  # ascending day
                age = last_day - int(r.day)
                score = score + (float(int(r.cnt))
                                 * (decay ** age))
                n += int(r.cnt)
            out_u.append(int(uid))
            out_s.append(score)
            out_n.append(n)
        return pa.table({
            "user_id": pa.array(out_u, type=pa.int64()),
            "n_events": pa.array(out_n, type=pa.int64()),
            "decayed_score": pa.array(out_s, type=pa.float64()),
        })

    d = f"{decay}e0"
    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events
    ),
    last AS (SELECT max(day) AS ld FROM e),
    c AS (
        SELECT user_id, day, CAST(count(*) AS BIGINT) AS cnt
        FROM e GROUP BY user_id, day
    )
    SELECT user_id,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           list_reduce(list_prepend(0.0e0,
               list(CAST(cnt AS DOUBLE)
                    * pow({d}, CAST((SELECT ld FROM last) - day
                                    AS DOUBLE))
                    ORDER BY day)),
               (a, b) -> a + b) AS decayed_score
    FROM c GROUP BY user_id
    """
    return q, sql


def build_wave83_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("rollup_compact_chain_w128",) + _compact_chain_query()))
    add(*(("doc_crest_factor",) + _crest_query()))
    add(*(("events_decayed_frequency",) + _decayed_freq_query()))
    return queries, oracles
