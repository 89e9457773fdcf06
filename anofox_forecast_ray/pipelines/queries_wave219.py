"""Wave-219 queries: Greenwood spacings, runs up-and-down.

- events_greenwood: Greenwood's statistic G = sum g_i^2 /
  (sum g_i)^2 over the inter-event spacings of the global event
  stream (whole seconds; ordered by ts, event_id) — the classic
  spacing-uniformity test (small G = evenly spread, large G =
  clumped). Both sums are exact int64; one division. Complements
  the interarrival-KS and inspection-paradox queries.
- events_runs_updown: the runs UP-AND-DOWN randomness test on the
  zero-filled daily error counts (different null than the
  runs-about-the-median test of wave 31): R = 1 + #sign changes of
  consecutive nonzero differences, E[R] = (2m-1)/3 and Var[R] =
  (16m-29)/90 with m = #nonzero differences + 1; z from exact
  integer counts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


def greenwood(gaps):
    """(n, s1, s2, g) exact ints + one division."""
    s1 = 0
    s2 = 0
    for v in gaps:
        s1 += int(v)
        s2 += int(v) * int(v)
    return len(gaps), s1, s2, s2 / (s1 * s1)


def runs_updown(x):
    """(m, r, z): runs of consecutive rises/falls, zero diffs
    dropped (the standard tie handling)."""
    signs = []
    for i in range(1, len(x)):
        d = int(x[i]) - int(x[i - 1])
        if d > 0:
            signs.append(1)
        elif d < 0:
            signs.append(-1)
    m = len(signs) + 1
    r = 1
    for i in range(1, len(signs)):
        if signs[i] != signs[i - 1]:
            r += 1
    e = (2 * m - 1) / 3.0e0
    var = (16 * m - 29) / 90.0e0
    z = (r - e) / math.sqrt(var)
    return m, r, z


# -------------------------------------------------- events_greenwood
def _greenwood_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prune(t: pa.Table) -> pa.Table:
            return pa.table({
                "tsec": (t.column("ts").cast(pa.int64())
                         .to_numpy(zero_copy_only=False)
                         // 1_000_000),
                "eid": t.column("event_id").cast(pa.int64()),
            })

        # spacings need the GLOBAL sorted stream: collect the
        # bounded (tsec, eid) key table and diff driver-side
        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_id"])
            .map_batches(prune, batch_format="pyarrow")
            .to_arrow_refs()
        )
        t = tree_reduce_tables(refs, lambda x: x).to_pandas()
        t = t.sort_values(["tsec", "eid"]).reset_index(drop=True)
        sec = t["tsec"].to_numpy(np.int64)
        gaps = np.diff(sec)
        n, s1, s2, g = greenwood(list(gaps))
        return pa.table({
            "n_gaps": pa.array([n], type=pa.int64()),
            "sum_g": pa.array([s1], type=pa.int64()),
            "sum_g2": pa.array([s2], type=pa.int64()),
            "greenwood_g": pa.array([g], type=pa.float64()),
        })

    sql = """
    WITH o AS (
        SELECT epoch_us(ts) // 1000000 AS tsec,
               lead(epoch_us(ts) // 1000000) OVER (
                   ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    gaps AS (
        SELECT nxt - tsec AS g FROM o WHERE nxt IS NOT NULL
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(g) AS BIGINT) AS s1,
               CAST(sum(g * g) AS BIGINT) AS s2
        FROM gaps
    )
    SELECT n AS n_gaps, s1 AS sum_g, s2 AS sum_g2,
           CAST(s2 AS DOUBLE)
               / CAST(s1 * s1 AS DOUBLE) AS greenwood_g
    FROM s
    """
    return q, sql


# ------------------------------------------------- events_runs_updown
def _updown_query():
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
        m, r, z = runs_updown([int(v) for v in h["c"]])
        return pa.table({
            "m_points": pa.array([m], type=pa.int64()),
            "n_runs": pa.array([r], type=pa.int64()),
            "z_updown": pa.array([z], type=pa.float64()),
        })

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
    ),
    diffs AS (
        SELECT day,
               CASE WHEN x - lag(x) OVER (ORDER BY day) > 0
                    THEN 1
                    WHEN x - lag(x) OVER (ORDER BY day) < 0
                    THEN -1 END AS sg
        FROM d
    ),
    nz AS (
        SELECT day, sg,
               lag(sg) OVER (ORDER BY day) AS prev
        FROM diffs WHERE sg IS NOT NULL
    ),
    s AS (
        SELECT CAST(count(*) + 1 AS BIGINT) AS m,
               CAST(1 + sum(CASE WHEN prev IS NOT NULL
                         AND sg <> prev THEN 1 ELSE 0 END)
                    AS BIGINT) AS r
        FROM nz
    )
    SELECT m AS m_points, r AS n_runs,
           (CAST(r AS DOUBLE)
            - CAST(2 * m - 1 AS DOUBLE) / 3.0e0)
           / sqrt(CAST(16 * m - 29 AS DOUBLE) / 90.0e0)
               AS z_updown
    FROM s
    """
    return q, sql


def build_wave219_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_greenwood",) + _greenwood_query()))
    add(*(("events_runs_updown",) + _updown_query()))
    return queries, oracles
