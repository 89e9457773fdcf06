"""Wave-21 queries: the continuous-aggregate maintenance ops a tiered
retention engine runs in production —

- rollup_incremental_w8: incremental refresh of the stored aggregate
  when a delta of tokens is appended mid-window (mergeable-partial
  algebra; oracle = the direct full-recompute SQL, so refresh ≡
  recompute is checked bitwise)
- source_ewma_alerts_w32: EWMA control-chart alerting over the
  aggregated w32 tier per source (monitoring composition; sequential
  fold replayed via list_reduce)
- doc_lttb_w8: Largest-Triangle-Three-Buckets visual downsample of each
  doc's w8 sum series, integer-exact scores so the per-bucket argmax
  selection replays bitwise in a recursive CTE

Reference anchors: continuous aggregates / compaction are the engine
core (SURVEY.md §7.4); LTTB complements the M4 downsample
(kernels/rollup.m4_flat); the EWMA chart composes kernels/windows.py
EWM semantics with the tree-reduced source rollup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import TierSpec
from .queries import (
    ROLLUP_SCHEMA,
    SQL_TOK,
    _cast,
    _rollup_query,
    corpus_ds,
)


def _incremental_query(width: int = 8):
    def q(sf_dir: str):
        from ..stages.rollup import make_incremental_refresh_fn

        ds = corpus_ds(sf_dir).map_batches(
            make_incremental_refresh_fn(width), batch_format="pyarrow"
        )
        return _cast(ds, ROLLUP_SCHEMA)

    _, sql = _rollup_query(width)
    return q, sql


def _ewma_alerts_query(width: int = 32, alpha: float = 0.25,
                       thr: float = 2.0):
    """EWMA control chart over the aggregated tier: per source, fold the
    w{width} mean series into (level, n_alerts, max_dev) where an alert
    fires when |m_t - level_{t-1}| > thr. The distributed work is the
    tree-reduced source rollup; the per-source fold is bounded scalar
    math mirrored exactly by the SQL list fold."""

    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.rollup import make_tier_rollup_fn
        from ..stages.source_rollup import source_window_rollup

        tier = (TierSpec(f"w{width}", width),)
        rollup = corpus_ds(sf_dir).map_batches(
            make_tier_rollup_fn(tier), batch_format="pyarrow"
        )
        agg = source_window_rollup(rollup, as_dataset=False)
        src = np.asarray(agg.column("source").to_pylist(), dtype=object)
        wid = agg.column("window_id").to_numpy(zero_copy_only=False)
        cnt = agg.column("cnt").to_numpy(zero_copy_only=False)
        s = agg.column("sum").to_numpy(zero_copy_only=False)
        order = np.lexsort((wid, src))
        src, cnt, s = src[order], cnt[order], s[order]
        a, b = alpha, 1.0 - alpha
        out = {"source": [], "n": [], "level": [], "n_alerts": [],
               "max_dev": []}
        i = 0
        while i < src.size:
            j = i
            level = None
            alerts = 0
            max_dev = 0.0
            while j < src.size and src[j] == src[i]:
                m = float(s[j]) / float(cnt[j])
                if level is None:
                    level = m
                else:
                    dev = abs(m - level)
                    if dev > thr:
                        alerts += 1
                    if dev > max_dev:
                        max_dev = dev
                    level = a * m + b * level
                j += 1
            if j - i >= 4:
                out["source"].append(src[i])
                out["n"].append(j - i)
                out["level"].append(level)
                out["n_alerts"].append(alerts)
                out["max_dev"].append(max_dev)
            i = j
        return rd.from_arrow(
            pa.table(
                {
                    "source": pa.array(out["source"], type=pa.string()),
                    "n": pa.array(out["n"], type=pa.int64()),
                    "level": pa.array(out["level"], type=pa.float64()),
                    "n_alerts": pa.array(out["n_alerts"], type=pa.int64()),
                    "max_dev": pa.array(out["max_dev"], type=pa.float64()),
                }
            )
        )

    a, b = alpha, 1.0 - alpha
    # LIST accumulator [level, alerts, max_dev] (struct accumulators are
    # buggy in DuckDB 1.0 — see NOTES.md); every field reads the PRE-
    # update acc[1], matching the engine's fold order.
    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT source, pos // {width} AS wid,
               CAST(sum(token) AS DOUBLE) / count(*) AS m
        FROM tok GROUP BY source, wid
    ),
    l AS (
        SELECT source, list(m ORDER BY wid) AS ms,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY source HAVING count(*) >= 4
    ),
    st AS (
        SELECT source, n, list_reduce(
            list_prepend([ms[1], 0.0e0, 0.0e0],
                         list_transform(ms[2:CAST(n AS INTEGER)],
                                        v -> [v, 0.0e0, 0.0e0])),
            (acc, x) -> [{a}e0 * x[1] + {b}e0 * acc[1],
                         acc[2] + CASE WHEN abs(x[1] - acc[1]) > {thr}e0
                                  THEN 1.0e0 ELSE 0.0e0 END,
                         greatest(acc[3], abs(x[1] - acc[1]))]) AS fin
        FROM l
    )
    SELECT source, n, fin[1] AS level,
           CAST(fin[2] AS BIGINT) AS n_alerts,
           fin[3] AS max_dev
    FROM st
    """
    return q, sql


def _lttb_query(width: int = 8, n_out: int = 12):
    def q(sf_dir: str):
        from ..kernels.rollup import lttb_select, rollup_flat
        from ..stages.rollup import _flat_tokens

        def lttb_batch(batch: pa.Table) -> pa.Table:
            values, lengths = _flat_tokens(batch)
            r = rollup_flat(values, lengths, width)
            ridx, win, s = r["row_idx"], r["window_id"], r["sum"]
            # per-doc contiguous runs (rollup emits them in row order)
            docs = []
            wins = []
            sums = []
            starts = np.concatenate(
                ([0], 1 + np.flatnonzero(ridx[1:] != ridx[:-1]),
                 [ridx.size])
            ) if ridx.size else np.array([0])
            for gi in range(starts.size - 1):
                lo, hi = int(starts[gi]), int(starts[gi + 1])
                sel = lttb_select(s[lo:hi], n_out)
                docs.append(np.full(sel.size, ridx[lo]))
                wins.append(win[lo:hi][sel])
                sums.append(s[lo:hi][sel])
            if not docs:
                return pa.table(
                    {
                        "doc_id": pa.array([], type=pa.string()),
                        "window_id": pa.array([], type=pa.int64()),
                        "wsum": pa.array([], type=pa.int64()),
                    }
                )
            dd = np.concatenate(docs)
            col = batch.column("doc_id")
            col = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            return pa.table(
                {
                    "doc_id": col.take(pa.array(dd)),
                    "window_id": pa.array(np.concatenate(wins)),
                    "wsum": pa.array(np.concatenate(sums)),
                }
            )

        ds = corpus_ds(sf_dir).map_batches(
            lttb_batch, batch_format="pyarrow"
        )
        return _cast(
            ds,
            {"doc_id": pa.string(), "window_id": pa.int64(),
             "wsum": pa.int64()},
        )

    nb = n_out - 2
    sql = f"""
    WITH RECURSIVE tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS x,
               CAST(sum(token) AS BIGINT) AS y
        FROM tok GROUP BY doc_id, pos // {width}
    ),
    yl AS (
        SELECT doc_id, list(y ORDER BY x) AS ys,
               CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY doc_id
    ),
    small AS (
        SELECT w.doc_id, w.x AS window_id, w.y AS wsum
        FROM w JOIN yl USING (doc_id) WHERE yl.n <= {n_out}
    ),
    bs AS (
        SELECT w.doc_id,
               ((w.x - 1) * {nb}) // (yl.n - 2) AS k,
               CAST(count(*) AS HUGEINT) AS m,
               CAST(sum(w.x) AS HUGEINT) AS sx,
               CAST(sum(w.y) AS HUGEINT) AS sy
        FROM w JOIN yl USING (doc_id)
        WHERE yl.n > {n_out} AND w.x BETWEEN 1 AND yl.n - 2
        GROUP BY w.doc_id, ((w.x - 1) * {nb}) // (yl.n - 2)
    ),
    st AS (
        SELECT doc_id, ys, n, CAST(0 AS BIGINT) AS k,
               CAST(0 AS BIGINT) AS ax
        FROM yl WHERE n > {n_out}
      UNION ALL
        -- argmax(score), ties to smallest i, as ONE list_aggregate max
        -- over the encoded key score*2^20 + (2^20 - i): lambda FOLDS
        -- inside recursive CTEs are corrupted in DuckDB 1.0 (NOTES.md),
        -- a plain max is not. Exact while i < 2^20 (same envelope as
        -- the int64 score bound documented in kernels/rollup.py).
        SELECT doc_id, ys, n, k + 1,
               CAST(1048576 - (best % 1048576) AS BIGINT) AS ax
        FROM (
            SELECT st.doc_id, st.ys, st.n, st.k,
                   list_aggregate(
                       list_transform(
                           list_filter(
                               range(1, CAST(st.n AS INTEGER) - 1),
                               i -> ((i - 1) * {nb}) // (st.n - 2)
                                    = st.k),
                           i -> abs(
                               (CAST(st.ax AS HUGEINT)
                                  * COALESCE(bs.m, 1)
                                - COALESCE(bs.sx, st.n - 1))
                               * (st.ys[i + 1]
                                  - st.ys[CAST(st.ax AS INTEGER) + 1])
                               - (st.ax - i)
                               * (COALESCE(bs.sy,
                                   st.ys[CAST(st.n AS INTEGER)])
                                  - st.ys[CAST(st.ax AS INTEGER) + 1]
                                    * COALESCE(bs.m, 1)))
                               * 1048576::HUGEINT
                               + (1048576 - i)),
                       'max') AS best
            FROM st LEFT JOIN bs
              ON bs.doc_id = st.doc_id AND bs.k = st.k + 1
            WHERE st.k < {nb}
        )
    ),
    sel AS (
        SELECT doc_id, ax AS window_id FROM st
        UNION ALL
        SELECT doc_id, n - 1 FROM yl WHERE n > {n_out}
    )
    SELECT s.doc_id, s.window_id, w.y AS wsum
    FROM sel s JOIN w ON w.doc_id = s.doc_id AND w.x = s.window_id
    UNION ALL
    SELECT doc_id, window_id, wsum FROM small
    """
    return q, sql


def build_wave21_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("rollup_incremental_w8",) + _incremental_query(8)))
    add(*(("source_ewma_alerts_w32",) + _ewma_alerts_query(32)))
    add(*(("doc_lttb_w8",) + _lttb_query(8, 12)))
    return queries, oracles
