"""Wave-102 queries: error recovery SLA and time-to-first-error.

- events_error_recovery: incident recovery — the share of error
  events followed by a NON-error event from the same user within
  5 minutes (and the count that never recover inside the window).
  Pure integer comparisons over the per-user ordered kernel; the
  oracle replays it with a windowed EXISTS.
- events_time_to_first_error: per-user latency from the first event
  to the first error, in minutes — median and P90 as LOWER
  nearest-rank order stats from the bounded minute histogram (the
  wave-90 discipline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

RECOVER_US = 300_000_000


# ------------------------------------------------------ events_error_recovery
def _recovery_query(window_us: int = RECOVER_US):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def recov(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            is_err = et == "error"
            n_err = 0
            n_rec = 0
            # vectorized per error: next non-error same-user within
            # the window — scan via searchsorted over non-error rows
            ok_idx = np.flatnonzero(~is_err)
            ok_users = users[ok_idx]
            ok_tus = tus[ok_idx]
            for i in np.flatnonzero(is_err):
                n_err += 1
                u, t0 = users[i], tus[i]
                j = np.searchsorted(ok_idx, i)
                while j < ok_idx.size and ok_users[j] == u:
                    if ok_tus[j] - t0 <= window_us:
                        if ok_tus[j] >= t0:
                            n_rec += 1
                            break
                        j += 1
                    else:
                        break
                # ok rows are user-contiguous after the sort, so the
                # loop exits at the first out-of-window or next user
            return pa.table({
                "n_err": pa.array([n_err], type=pa.int64()),
                "n_rec": pa.array([n_rec], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                for c in ("n_err", "n_rec")
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id",
                         "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(recov, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        n_err = int(a.column("n_err")[0].as_py())
        n_rec = int(a.column("n_rec")[0].as_py())
        return pa.table({
            "n_errors": pa.array([n_err], type=pa.int64()),
            "n_recovered": pa.array([n_rec], type=pa.int64()),
            "recovery_rate": pa.array(
                [float(n_rec) / float(n_err) if n_err else 0.0],
                type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    err AS (SELECT * FROM e WHERE event_type = 'error'),
    rec AS (
        SELECT err.event_id,
               CASE WHEN EXISTS (
                   SELECT 1 FROM e o
                   WHERE o.user_id = err.user_id
                     AND o.event_type <> 'error'
                     AND o.tus >= err.tus
                     AND o.tus - err.tus <= {window_us}
                     AND (o.tus > err.tus
                          OR o.event_id > err.event_id)
               ) THEN 1 ELSE 0 END AS r
        FROM err
    )
    SELECT CAST(count(*) AS BIGINT) AS n_errors,
           CAST(sum(r) AS BIGINT) AS n_recovered,
           CAST(sum(r) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS recovery_rate
    FROM rec
    """
    return q, sql


# ------------------------------------------------ events_time_to_first_error
def _first_error_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def lat(g: pa.Table) -> pa.Table:
            # per-user t0 / first-error via reduceat over user-sorted
            # rows (+inf masking), histogram by minutes — exact int
            # replacement of the per-user pandas loop
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            is_err = et == "error"
            order = np.argsort(u, kind="stable")
            t_s = tus[order]
            e_s = is_err[order]
            u_s = u[order]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            t0 = np.minimum.reduceat(t_s, starts)
            BIG = np.int64(1) << 62
            te = np.minimum.reduceat(
                np.where(e_s, t_s, BIG), starts
            )
            has = te < BIG
            minutes = (te[has] - t0[has]) // 60_000_000
            um, uc = np.unique(minutes, return_counts=True)
            return pa.table({
                "minutes": pa.array(
                    np.r_[um, np.int64(-1)], type=pa.int64()),
                "cnt": pa.array(
                    np.r_[uc.astype(np.int64), np.int64(0)],
                    type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("minutes").aggregate([("cnt", "sum")])
            return pa.table({
                "minutes": g.column("minutes").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(lat, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h[(h["minutes"] >= 0) & (h["cnt"] > 0)].sort_values(
            "minutes").reset_index(drop=True)
        n = int(h["cnt"].sum())
        cum = h["cnt"].cumsum().to_numpy(np.int64)
        vals = h["minutes"].to_numpy(np.int64)

        def rank_stat(q100):
            target = (n - 1) * q100 // 100
            return int(vals[np.searchsorted(cum, target + 1)])

        return pa.table({
            "n_users": pa.array([n], type=pa.int64()),
            "median_min": pa.array([rank_stat(50)],
                                   type=pa.int64()),
            "p90_min": pa.array([rank_stat(90)],
                                type=pa.int64()),
        })

    sql = """
    WITH u AS (
        SELECT user_id,
               min(epoch_us(ts)) AS t0,
               min(CASE WHEN event_type = 'error'
                   THEN epoch_us(ts) END) AS te
        FROM events GROUP BY user_id
    ),
    lat AS (
        SELECT (te - t0) // 60000000 AS minutes
        FROM u WHERE te IS NOT NULL
    ),
    r AS (
        SELECT minutes,
               row_number() OVER (ORDER BY minutes) AS rn,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM lat
    )
    SELECT CAST(max(n) AS BIGINT) AS n_users,
           CAST(max(CASE WHEN rn = (n - 1) * 50 // 100 + 1
                    THEN minutes END) AS BIGINT) AS median_min,
           CAST(max(CASE WHEN rn = (n - 1) * 90 // 100 + 1
                    THEN minutes END) AS BIGINT) AS p90_min
    FROM r
    """
    return q, sql


def build_wave102_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_error_recovery",) + _recovery_query()))
    add(*(("events_time_to_first_error",) + _first_error_query()))
    return queries, oracles
