"""Wave-230 query: the madogram (first-order variogram).

events_madogram: the geostatistics dependence-vs-distance summary
applied in time — gamma(h) = E|x_{t+h} - x_t| / 2 for lags h =
1..6 over the zero-filled daily error counts. Each lag's sum of
absolute differences is an exact int64 and gamma(h) is ONE
division; the madogram's rise-and-flatten shape gives the range
of temporal dependence. Emits one row per lag.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
MAX_LAG = 6


def madogram(x, max_lag: int = MAX_LAG):
    """[(h, n_pairs, sum_abs, gamma)] exact ints + one division."""
    out = []
    n = len(x)
    for h in range(1, max_lag + 1):
        s = 0
        for t in range(n - h):
            s += abs(int(x[t + h]) - int(x[t]))
        m = n - h
        out.append((h, m, s, s / (2 * m)))
    return out


# ------------------------------------------------------ events_madogram
def _madogram_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if tus.size == 0:
                return pa.table({
                    "day": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                })
            day = tus // US_PER_DAY
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error")
            lo, hi = int(day.min()), int(day.max())
            span = hi - lo + 1
            cnt = np.bincount((day[err] - lo).astype(np.int64),
                              minlength=span).astype(np.int64)
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(cnt),
                "lo": pa.array(np.full(span, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(span, hi,
                                       dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            lo = int(df["lo"].min())
            hi = int(df["hi"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            g = df.groupby("day")["c"].sum()
            c = np.zeros(grid.size, dtype=np.int64)
            c[g.index.to_numpy(np.int64) - lo] = g.to_numpy(
                np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(c),
                "lo": pa.array(np.full(grid.size, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(grid.size, hi,
                                       dtype=np.int64)),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("day").reset_index(drop=True)
        rows = madogram([int(v) for v in h["c"]])
        return pa.table({
            "lag": pa.array([r[0] for r in rows],
                            type=pa.int64()),
            "n_pairs": pa.array([r[1] for r in rows],
                                type=pa.int64()),
            "sum_abs": pa.array([r[2] for r in rows],
                                type=pa.int64()),
            "gamma": pa.array([r[3] for r in rows],
                              type=pa.float64()),
        })

    lag_rows = " UNION ALL ".join(f"""
        SELECT CAST({h} AS BIGINT) AS lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(abs(nxt - x)) AS BIGINT) AS sum_abs,
               CAST(sum(abs(nxt - x)) AS DOUBLE)
                   / CAST(2 * count(*) AS DOUBLE) AS gamma
        FROM (
            SELECT x, lead(x, {h}) OVER (ORDER BY day) AS nxt
            FROM d
        ) WHERE nxt IS NOT NULL""" for h in range(1, MAX_LAG + 1))
    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.err, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_err) AS err FROM e GROUP BY day
        ) c ON g.day = c.day
    )
    {lag_rows}
    """
    return q, sql


def build_wave230_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_madogram",) + _madogram_query()))
    return queries, oracles
