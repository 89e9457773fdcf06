"""Wave-184 queries: Goertzel single-bin power, Savitzky-Golay filter.

- events_goertzel_24h: the Goertzel algorithm — the O(N) single-bin
  DFT used by tone detectors — at the diurnal frequency (period 24)
  over the zero-filled hourly event-count series. The recurrence
  s_t = x_t + c*s_{t-1} - s_{t-2} with c = 2cos(pi/12) is a pure
  sequential 2-slot fold (SQL LIST accumulator; struct accumulators
  are buggy in DuckDB 1.0), and power = s1^2 + s2^2 - c*s1*s2. One
  anchored cos; scalar math.cos == DuckDB cos (same libm).
- doc_savgol_w8: Savitzky-Golay quadratic 5-point smoothing of each
  doc's w8 token-window SUM series (integers!): the classic
  least-squares-in-a-window filter reduces to the exact integer
  convolution (-3,12,17,12,-3)/35 — one division per interior
  window, bitwise-safe. Emits (doc_id, window_id, sg) rows.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


def goertzel_power(x, period: int = 24) -> float:
    """Goertzel single-bin power at 2*pi/period; sequential fold."""
    c = 2.0 * math.cos(math.pi / (period / 2.0))
    s1 = 0.0
    s2 = 0.0
    for v in x:
        s1, s2 = float(v) + c * s1 - s2, s1
    return s1 * s1 + s2 * s2 - c * s1 * s2


def savgol5(s: np.ndarray) -> np.ndarray:
    """Quadratic 5-point SG filter over an int64 series -> interior
    values (length n-4); exact int convolution then one division."""
    num = (-3 * s[:-4] + 12 * s[1:-3] + 17 * s[2:-2]
           + 12 * s[3:-1] - 3 * s[4:])
    return num / 35.0


# ------------------------------------------------- events_goertzel_24h
def _goertzel_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if tus.size == 0:
                return pa.table({
                    "hour": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                })
            hour = tus // US_PER_HOUR
            lo = int(hour.min())
            hi = int(hour.max())
            cnt = np.bincount((hour - lo).astype(np.int64),
                              minlength=hi - lo + 1).astype(np.int64)
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            return pa.table({
                "hour": pa.array(grid), "c": pa.array(cnt),
                "lo": pa.array(np.full(grid.size, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(grid.size, hi,
                                       dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            lo = int(df["lo"].min())
            hi = int(df["hi"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            g = df.groupby("hour")["c"].sum()
            c = np.zeros(grid.size, dtype=np.int64)
            c[g.index.to_numpy(np.int64) - lo] = g.to_numpy(np.int64)
            return pa.table({
                "hour": pa.array(grid), "c": pa.array(c),
                "lo": pa.array(np.full(grid.size, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(grid.size, hi,
                                       dtype=np.int64)),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("hour").reset_index(drop=True)
        x = h["c"].to_numpy(np.int64)
        p = goertzel_power(x)
        return pa.table({
            "n_hours": pa.array([x.size], type=pa.int64()),
            "goertzel_power": pa.array([p], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour FROM events
    ),
    span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM e),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS hour
        FROM span
    ),
    h AS (
        SELECT g.hour, CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT hour, count(*) AS cnt FROM e GROUP BY hour
        ) c ON g.hour = c.hour
    ),
    fold AS (
        SELECT CAST(count(*) AS BIGINT) AS n_hours,
               list_reduce(
                   list_prepend([0.0e0, 0.0e0],
                       list([CAST(x AS DOUBLE)] ORDER BY hour)),
                   (acc, e) -> [e[1]
                                + 2.0e0 * cos(pi() / 12.0e0) * acc[1]
                                - acc[2],
                                acc[1]]) AS s
        FROM h
    )
    SELECT n_hours,
           s[1] * s[1] + s[2] * s[2]
           - 2.0e0 * cos(pi() / 12.0e0) * s[1] * s[2]
               AS goertzel_power
    FROM fold
    """
    return q, sql


# ------------------------------------------------------- doc_savgol_w8
def _savgol_query(width: int = 8):
    def q(sf_dir: str):
        from .queries import _cast, corpus_ds

        def sg(t: pa.Table) -> pa.Table:
            toks = t.column("tokens")
            dids = t.column("doc_id").to_pylist()
            out_d, out_w, out_v = [], [], []
            for i in range(len(dids)):
                arr = np.asarray(toks[i].as_py(), dtype=np.int64)
                if arr.size == 0:
                    continue
                nw = (arr.size + width - 1) // width
                if nw < 5:
                    continue
                bounds = np.arange(0, arr.size, width)
                sums = np.add.reduceat(arr, bounds)
                vals = savgol5(sums)
                wids = np.arange(2, nw - 2, dtype=np.int64)
                out_d.extend([dids[i]] * wids.size)
                out_w.append(wids)
                out_v.append(vals)
            if not out_d:
                return pa.table({
                    "doc_id": pa.array([], type=pa.string()),
                    "window_id": pa.array([], type=pa.int64()),
                    "sg": pa.array([], type=pa.float64()),
                })
            return pa.table({
                "doc_id": pa.array(out_d, type=pa.string()),
                "window_id": pa.array(np.concatenate(out_w)),
                "sg": pa.array(np.concatenate(out_v),
                               type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(sg, batch_format="pyarrow")
        return _cast(ds, {"doc_id": pa.string(),
                          "window_id": pa.int64(),
                          "sg": pa.float64()})

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    f AS (
        SELECT doc_id, wid,
               lag(s, 2) OVER win AS a,
               lag(s, 1) OVER win AS b,
               s AS c,
               lead(s, 1) OVER win AS d,
               lead(s, 2) OVER win AS e
        FROM w
        WINDOW win AS (PARTITION BY doc_id ORDER BY wid)
    )
    SELECT doc_id, CAST(wid AS BIGINT) AS window_id,
           CAST(-3 * a + 12 * b + 17 * c + 12 * d - 3 * e
                AS DOUBLE) / 35.0e0 AS sg
    FROM f
    WHERE a IS NOT NULL AND b IS NOT NULL
      AND d IS NOT NULL AND e IS NOT NULL
    """
    return q, sql


def build_wave184_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_goertzel_24h",) + _goertzel_query()))
    add(*(("doc_savgol_w8",) + _savgol_query()))
    return queries, oracles
