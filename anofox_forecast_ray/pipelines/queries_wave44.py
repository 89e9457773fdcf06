"""Wave-44 queries: longest increasing subsequence, moving type-token
ratio, and first-touch attribution.

- doc_lis_length: longest STRICTLY increasing subsequence of the token
  series per doc — patience sorting, O(n log n) with a vectorized
  binary search per element. Not SQL-expressible (the DP is inherently
  sequential); verified by an independent O(n^2) numpy DP golden in
  tools/golden_oracles.check_lis.
- corpus_mattr_w32: moving-average type-token ratio — distinct tokens
  per non-overlapping 32-token window, the lexical-diversity metric
  (Covington's MATTR with tumbling windows). Distinct counts are exact
  integers; the ratio is one f64 division.
- events_first_touch: first-touch attribution — each purchase credits
  the FIRST event of the same user in the preceding 24 hours
  (exclusive); purchases with no prior event in the window credit
  'none'. Per-user bucket kernel with searchsorted windows; bounded
  per-type counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

WIN_US = 24 * 3600 * 1_000_000


# --------------------------------------------------------- doc_lis_length
def lis_length(x: np.ndarray) -> int:
    """Patience LIS (strict) — tails[i] = smallest possible tail of an
    increasing subsequence of length i+1."""
    tails = np.empty(x.size, dtype=np.int64)
    m = 0
    for v in x:
        i = int(np.searchsorted(tails[:m], v, side="left"))
        tails[i] = v
        if i == m:
            m += 1
    return m


def _lis_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def lis(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tok": pa.array([], type=pa.int64()),
                 "lis": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            out_id, out_n, out_l = [], [], []
            off = 0
            for did, ln in zip(ids, lens):
                x = v[off:off + ln]
                off += ln
                if ln == 0:
                    continue
                out_id.append(int(did))
                out_n.append(int(ln))
                out_l.append(lis_length(x))
            return pa.table(
                {"doc_id": pa.array(out_id, type=pa.int64()),
                 "n_tok": pa.array(out_n, type=pa.int64()),
                 "lis": pa.array(out_l, type=pa.int64())}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(lis,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "n_tok": pa.int64(),
             "lis": pa.int64()},
        )

    return q, None  # golden-checked (tools/golden_oracles.check_lis)


# --------------------------------------------------------- corpus_mattr_w32
def _mattr_query(w: int = 32):
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def mattr(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_windows": pa.array([], type=pa.int64()),
                 "sum_distinct": pa.array([], type=pa.int64()),
                 "mattr": pa.array([], type=pa.float64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )
            # full windows only: (doc, window, token) distinct keys
            seg = np.repeat(np.arange(lens.size, dtype=np.int64),
                            lens)
            pos = (np.arange(v.size, dtype=np.int64)
                   - np.repeat(
                       np.concatenate(([0], np.cumsum(lens)))[:-1],
                       lens))
            full = pos < (np.repeat(lens // w, lens) * w)
            wid = pos // w
            key = ((seg[full] << np.int64(40))
                   | (wid[full] << np.int64(21)) | v[full])
            uk = np.unique(key)
            dwin = uk >> np.int64(40)  # doc index per distinct entry
            ud, ucnt = np.unique(dwin, return_counts=True)
            sum_distinct = np.zeros(lens.size, dtype=np.int64)
            sum_distinct[ud] = ucnt
            nw = lens // w
            keep = nw > 0
            md = (sum_distinct[keep].astype(np.float64)
                  / (nw[keep] * w).astype(np.float64))
            return pa.table(
                {"doc_id": pa.array(ids[keep]),
                 "n_windows": pa.array(nw[keep]),
                 "sum_distinct": pa.array(sum_distinct[keep]),
                 "mattr": pa.array(md, type=pa.float64())}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(mattr,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "n_windows": pa.int64(),
             "sum_distinct": pa.int64(), "mattr": pa.float64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    lens AS (
        SELECT doc_id, (count(*) // {w}) AS nw FROM tok
        GROUP BY doc_id
    ),
    win AS (
        SELECT t.doc_id, t.pos // {w} AS wid,
               CAST(count(DISTINCT t.token) AS BIGINT) AS d
        FROM tok t JOIN lens l ON l.doc_id = t.doc_id
        WHERE t.pos < l.nw * {w}
        GROUP BY t.doc_id, t.pos // {w}
    )
    SELECT CAST(wn.doc_id AS BIGINT) AS doc_id,
           CAST(l.nw AS BIGINT) AS n_windows,
           CAST(sum(wn.d) AS BIGINT) AS sum_distinct,
           CAST(sum(wn.d) AS DOUBLE)
               / CAST(l.nw * {w} AS DOUBLE) AS mattr
    FROM win wn JOIN lens l ON l.doc_id = wn.doc_id
    WHERE l.nw > 0
    GROUP BY wn.doc_id, l.nw
    """
    return q, sql


# --------------------------------------------------------- events_first_touch
def _first_touch_query(win_us: int = WIN_US):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def attribute(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            out: dict[str, int] = {}
            starts = np.flatnonzero(
                np.r_[True, users[1:] != users[:-1]]
            )
            ends = np.r_[starts[1:], users.size]
            for s, e in zip(starts, ends):
                ts_u = tus[s:e]
                et_u = et[s:e]
                for i in np.flatnonzero(et_u == "purchase"):
                    lo = int(np.searchsorted(
                        ts_u, ts_u[i] - win_us, side="left"))
                    # first event strictly before the purchase
                    if lo < i:
                        key = str(et_u[lo])
                    else:
                        key = "none"
                    out[key] = out.get(key, 0) + 1
            names = sorted(out) or ["none"]
            return pa.table(
                {"first_touch": pa.array(names, type=pa.string()),
                 "n_purchases": pa.array(
                     [out.get(n, 0) for n in names],
                     type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("first_touch").aggregate(
                [("n_purchases", "sum")]
            )
            return pa.table(
                {"first_touch": g.column("first_touch"),
                 "n_purchases":
                     g.column("n_purchases_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(attribute, batch_format="pyarrow")
            .to_arrow_refs()
        )
        out = tree_reduce_tables(refs, merge).to_pandas()
        out = out[out["n_purchases"] > 0].sort_values("first_touch")
        return pa.table(
            {"first_touch": pa.array(out["first_touch"],
                                     type=pa.string()),
             "n_purchases": pa.array(
                 out["n_purchases"].to_numpy(np.int64))}
        )

    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    att AS (
        SELECT p.event_id,
               COALESCE((
                   SELECT f.event_type FROM e f
                   WHERE f.user_id = p.user_id
                     AND f.tus >= p.tus - {win_us}
                     AND (f.tus < p.tus
                          OR (f.tus = p.tus
                              AND f.event_id < p.event_id))
                   ORDER BY f.tus, f.event_id LIMIT 1
               ), 'none') AS first_touch
        FROM p
    )
    SELECT first_touch, CAST(count(*) AS BIGINT) AS n_purchases
    FROM att GROUP BY first_touch
    """
    return q, sql


def build_wave44_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_lis_length",) + _lis_query()))
    add(*(("corpus_mattr_w32",) + _mattr_query(32)))
    add(*(("events_first_touch",) + _first_touch_query()))
    return queries, oracles
