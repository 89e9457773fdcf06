"""Wave-32 queries: OHLC candlestick rollups, running max drawdown, and
largest-remainder stratified sampling.

- doc_ohlc_w8: open/high/low/close per (doc, 8-token window) — the
  candlestick downsample a market-data tier store serves. All four
  outputs are exact integers; open/close are positional gathers from
  the flat token buffer (no per-row loop), high/low are reduceat
  extrema. In-row like the rollup family: zero shuffle.
- doc_max_drawdown: max over t of (running-max - value) per doc — the
  classic risk metric, exact in int64. The per-doc running max is ONE
  vectorized np.maximum.accumulate over the whole block via the
  segment-offset trick (token < 2^21, so adding seg_id << 22 makes the
  accumulate reset at every doc boundary).
- source_stratified_sample: total budget K=100 allocated to sources by
  the largest-remainder method (Hamilton apportionment) on exact
  counts, then the quota per source filled by smallest sha-rank — the
  deterministic stratified sampler a mixture-building pipeline runs.
  Bounded count partials; the selection scan re-ranks per source.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

W = 8
K_TOTAL = 100
_SEG_SHIFT = np.int64(22)  # token < 2^21 -> offsets dominate values


# --------------------------------------------------------------- doc_ohlc_w8
def _ohlc_query(w: int = W):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def ohlc(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "window_id": pa.array([], type=pa.int64()),
                 "o": pa.array([], type=pa.int64()),
                 "h": pa.array([], type=pa.int64()),
                 "l": pa.array([], type=pa.int64()),
                 "c": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            nwin = -(-lens // w)  # ceil
            total = int(nwin.sum())
            if total == 0:
                return empty
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            doc_rep = np.repeat(np.arange(lens.size), nwin)
            # window index within doc via the repeat-range trick
            wid = (np.arange(total, dtype=np.int64)
                   - np.repeat(np.concatenate(
                       ([0], np.cumsum(nwin)))[:-1], nwin))
            start = offs[doc_rep] + wid * w
            end = np.minimum(start + w, offs[doc_rep] + lens[doc_rep])
            h = np.maximum.reduceat(v, start)
            low = np.minimum.reduceat(v, start)
            # reduceat treats a start == len(v) edge; starts here are
            # always < len(v) because every window is non-empty, but a
            # window whose start is the LAST flat index still reduces
            # over [start, next_start) — next_start is the next window's
            # start, which equals this window's end by construction
            # except for the final window of the block (reduceat runs to
            # the array end, which is that window's end). Both cases
            # give exactly [start, end).
            return pa.table(
                {"doc_id": pa.array(ids[doc_rep]),
                 "window_id": pa.array(wid),
                 "o": pa.array(v[start]),
                 "h": pa.array(h),
                 "l": pa.array(low),
                 "c": pa.array(v[end - 1])}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(ohlc, batch_format="pyarrow"),
            {"doc_id": pa.int64(), "window_id": pa.int64(),
             "o": pa.int64(), "h": pa.int64(), "l": pa.int64(),
             "c": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK})
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(pos // {w} AS BIGINT) AS window_id,
           CAST(arg_min(token, pos) AS BIGINT) AS o,
           CAST(max(token) AS BIGINT) AS h,
           CAST(min(token) AS BIGINT) AS l,
           CAST(arg_max(token, pos) AS BIGINT) AS c
    FROM tok GROUP BY doc_id, pos // {w}
    """
    return q, sql


# ---------------------------------------------------------- doc_max_drawdown
def _drawdown_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def dd(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tok": pa.array([], type=pa.int64()),
                 "peak": pa.array([], type=pa.int64()),
                 "max_dd": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            lens = lengths.astype(np.int64)
            ids = np.asarray(
                [int(d) for d in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            keep = lens > 0
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            seg = np.repeat(
                np.arange(lens.size, dtype=np.int64), lens
            )
            shifted = v + (seg << _SEG_SHIFT)
            cm = np.maximum.accumulate(shifted) - (seg << _SEG_SHIFT)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1][keep]
            max_dd = np.maximum.reduceat(cm - v, starts)
            peak = np.maximum.reduceat(v, starts)
            return pa.table(
                {"doc_id": pa.array(ids[keep]),
                 "n_tok": pa.array(lens[keep]),
                 "peak": pa.array(peak),
                 "max_dd": pa.array(max_dd)}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(dd, batch_format="pyarrow"),
            {"doc_id": pa.int64(), "n_tok": pa.int64(),
             "peak": pa.int64(), "max_dd": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    r AS (
        SELECT doc_id, token,
               max(token) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS cm
        FROM tok
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           CAST(max(token) AS BIGINT) AS peak,
           CAST(max(cm - token) AS BIGINT) AS max_dd
    FROM r GROUP BY doc_id
    """
    return q, sql


# ------------------------------------------------- source_stratified_sample
_U_HEX = 15  # 60-bit sha prefix (== source_weighted_sample)


def _stratified_query(k_total: int = K_TOTAL):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def cnt_partial(t: pa.Table) -> pa.Table:
            if "source" not in t.column_names:
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "n": pa.array([], type=pa.int64())}
                )
            g = pa.table({"source": t.column("source")}).group_by(
                "source"
            ).aggregate([("source", "count")])
            return pa.table(
                {"source": g.column("source"),
                 "n": g.column("source_count").cast(pa.int64())}
            )

        def cnt_merge(t: pa.Table) -> pa.Table:
            g = t.group_by("source").aggregate([("n", "sum")])
            return pa.table(
                {"source": g.column("source"),
                 "n": g.column("n_sum").cast(pa.int64())}
            )

        def read_counts():
            return read_cols(sf_dir, "documents", ["source"])

        refs = list(
            read_counts()
            .map_batches(cnt_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        c = tree_reduce_tables(refs, cnt_merge).to_pandas()
        n_total = int(c["n"].sum())
        c["base"] = (k_total * c["n"]) // n_total
        c["rem"] = (k_total * c["n"]) % n_total
        deficit = k_total - int(c["base"].sum())
        c = c.sort_values(["rem", "source"],
                          ascending=[False, True]).reset_index(drop=True)
        c["quota"] = c["base"] + (
            np.arange(len(c)) < deficit
        ).astype(np.int64)
        quota = dict(zip(c["source"], c["quota"].astype(int)))

        def project(t: pa.Table) -> pa.Table:
            if "doc_id" not in t.column_names:
                return pa.table(
                    {"source": pa.array([], type=pa.string()),
                     "doc_id": pa.array([], type=pa.int64()),
                     "h": pa.array([], type=pa.int64())}
                )
            ids = t.column("doc_id").to_pylist()
            h = np.fromiter(
                (int(hashlib.sha256(str(int(d)).encode())
                     .hexdigest()[:_U_HEX], 16) for d in ids),
                dtype=np.int64, count=len(ids),
            )
            return pa.table(
                {"source": t.column("source"),
                 "doc_id": pa.array(
                     np.asarray([int(d) for d in ids],
                                dtype=np.int64)),
                 "h": pa.array(h)}
            )

        def pick(g: pa.Table) -> pa.Table:
            kq = quota.get(str(g.column("source")[0].as_py()), 0)
            g = g.sort_by([("h", "ascending"),
                           ("doc_id", "ascending")]).slice(0, kq)
            return g.select(["source", "doc_id"])

        ds = (
            read_cols(sf_dir, "documents", ["doc_id", "source"])
            .map_batches(project, batch_format="pyarrow")
            .groupby("source")
            .map_groups(pick, batch_format="pyarrow")
        )
        return _cast(
            ds, {"source": pa.string(), "doc_id": pa.int64()}
        )

    sql = f"""
    WITH c AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
        GROUP BY source
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
    q0 AS (
        SELECT source, n, ({k_total} * n) // t.nt AS base,
               ({k_total} * n) % t.nt AS rem
        FROM c, t
    ),
    d AS (SELECT {k_total} - sum(base) AS deficit FROM q0),
    qr AS (
        SELECT source,
               base + CASE WHEN row_number() OVER (
                               ORDER BY rem DESC, source) <= d.deficit
                      THEN 1 ELSE 0 END AS quota
        FROM q0, d
    ),
    h AS (
        SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
               CAST(concat('0x', substr(
                   sha256(CAST(doc_id AS VARCHAR)), 1, {_U_HEX}))
                   AS BIGINT) AS hh,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(concat('0x', substr(
                       sha256(CAST(doc_id AS VARCHAR)), 1, {_U_HEX}))
                       AS BIGINT), doc_id) AS rk
        FROM documents
    )
    SELECT h.source, h.doc_id
    FROM h JOIN qr ON qr.source = h.source
    WHERE h.rk <= qr.quota
    """
    return q, sql


def build_wave32_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_ohlc_w8",) + _ohlc_query(W)))
    add(*(("doc_max_drawdown",) + _drawdown_query()))
    add(*(("source_stratified_sample",) + _stratified_query(K_TOTAL)))
    return queries, oracles
