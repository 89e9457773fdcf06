"""Wave-38 queries: SCD2 interval construction, windowed stream
deduplication, and accumulating-snapshot fulfillment lag.

- events_scd2_intervals: slowly-changing-dimension type-2 history —
  per user, consecutive same-type event runs collapse to validity
  intervals [run start, next run start), the last run closing at the
  user's final event. Runs are the gaps-and-islands pattern inside the
  user-bucket kernel; intervals are exact int64 microseconds.
- events_window_dedup: streaming dedup — within each (user, type,
  hour) cell only the first event (min ts, then min event_id) is
  kept. Per-block argmin partials collapse BEFORE the shuffle; output
  is the per-user kept/dropped accounting.
- orders_fulfillment_lag: accumulating-snapshot metric — per order the
  lag from order date to LAST shipment, aggregated per priority
  (n, sum of lag days, max lag days, mean as one division). Reuses the
  semi-join co-location: lineitem pre-collapses to per-key max before
  the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

_MIX = np.uint64(0x9E3779B97F4A7C15)
DAY_US = 86_400_000_000


# ------------------------------------------------- events_scd2_intervals
def _scd2_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def scd2(g: pa.Table) -> pa.Table:
            # event_id is unique -> the 3-key sort is a total order
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            ts = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            brk = np.r_[
                True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])
            ]
            rs = np.flatnonzero(brk)
            re = np.r_[rs[1:], u.size]
            ru = u[rs]
            # valid_to: start of next run of the SAME user, else the
            # user's last event ts
            nxt_start = np.empty(rs.size, dtype=np.int64)
            same_user = np.r_[ru[1:] == ru[:-1], False]
            nxt_start[same_user] = ts[rs[1:]][ru[1:] == ru[:-1]]
            last_ts = ts[re - 1]
            nxt_start[~same_user] = last_ts[~same_user]
            return pa.table(
                {"user_id": pa.array(ru, type=pa.int64()),
                 "event_type": pa.array(et[rs], type=pa.string()),
                 "valid_from": pa.array(ts[rs], type=pa.int64()),
                 "valid_to": pa.array(nxt_start, type=pa.int64()),
                 "n_events": pa.array((re - rs).astype(np.int64),
                                      type=pa.int64())}
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(scd2, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"user_id": pa.int64(), "event_type": pa.string(),
             "valid_from": pa.int64(), "valid_to": pa.int64(),
             "n_events": pa.int64()},
        )

    sql = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    flg AS (
        SELECT user_id, tus, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                      OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id
                            ORDER BY tus, event_id)
    ),
    runs AS (
        SELECT user_id, tus, event_type,
               sum(brk) OVER (PARTITION BY user_id
                              ORDER BY tus, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_id
        FROM flg
    ),
    iv AS (
        SELECT user_id, event_type, run_id,
               CAST(min(tus) AS BIGINT) AS valid_from,
               CAST(max(tus) AS BIGINT) AS run_last,
               CAST(count(*) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id, event_type, run_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
           valid_from,
           COALESCE(lead(valid_from) OVER (PARTITION BY user_id
                                           ORDER BY valid_from),
                    CAST(max(run_last) OVER (PARTITION BY user_id)
                         AS BIGINT)) AS valid_to,
           n_events
    FROM iv
    """
    return q, sql


# -------------------------------------------------- events_window_dedup
def _window_dedup_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "cell": pa.array([], type=pa.string()),
                 "first_ts": pa.array([], type=pa.int64()),
                 "first_id": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            df = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            ).to_pandas()
            df["hour"] = df["tus"] // 1_000_000 // 3600
            df["cell"] = (df["event_type"] + "|"
                          + df["hour"].astype(str))
            df = df.sort_values(["user_id", "cell", "tus",
                                 "event_id"])
            a = (df.groupby(["user_id", "cell"], sort=False)
                 .agg(first_ts=("tus", "first"),
                      first_id=("event_id", "first"),
                      n=("tus", "size"))
                 .reset_index())
            a["n"] = a["n"].astype(np.int64)
            return pa.Table.from_pandas(a, preserve_index=False)

        def merge_bucket(g: pa.Table) -> pa.Table:
            # pure-Arrow hash aggregates: only sums/counts on int64, so
            # the pandas sort-then-group dance is unnecessary and the
            # replacement is exact
            a = g.group_by(["user_id", "cell"]).aggregate(
                [("n", "sum")]
            )
            kept = a.group_by("user_id").aggregate(
                [("cell", "count"), ("n_sum", "sum")]
            )
            uid = kept.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            n_kept = kept.column("cell_count").cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            n_total = kept.column("n_sum_sum").cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
            return pa.table(
                {"user_id": pa.array(uid, type=pa.int64()),
                 "n_kept": pa.array(n_kept, type=pa.int64()),
                 "n_dropped": pa.array(n_total - n_kept,
                                       type=pa.int64())}
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(merge_bucket, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"user_id": pa.int64(), "n_kept": pa.int64(),
             "n_dropped": pa.int64()},
        )

    sql = """
    WITH c AS (
        SELECT user_id, event_type,
               epoch_us(ts) // 1000000 // 3600 AS hour,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(n) - count(*) AS BIGINT) AS n_dropped
    FROM c GROUP BY user_id
    """
    return q, sql


# ----------------------------------------------- orders_fulfillment_lag
def _fulfillment_lag_query(n_buckets: int = 64):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def li_partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "max_ship": pa.array([], type=pa.int64()),
                 "o_us": pa.array([], type=pa.int64()),
                 "prio": pa.array([], type=pa.string()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "l_orderkey" not in t.column_names:
                return empty
            tab = pa.table(
                {"key": t.column("l_orderkey").cast(pa.int64()),
                 "ship": t.column("l_shipdate").cast(pa.int64())}
            ).group_by("key").aggregate([("ship", "max")])
            kk = tab.column("key").to_numpy(zero_copy_only=False)
            n = len(kk)
            return pa.table(
                {"key": tab.column("key"),
                 "max_ship": tab.column("ship_max").cast(pa.int64()),
                 "o_us": pa.array(np.zeros(n, dtype=np.int64)),
                 "prio": pa.array([""] * n, type=pa.string()),
                 "kind": pa.array(np.ones(n, dtype=np.int8),
                                  type=pa.int8()),
                 "bucket": pa.array(
                     (((kk.astype(np.uint64) * _MIX)
                       >> np.uint64(48)).astype(np.int64))
                     % n_buckets)}
            )

        def o_prep(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "max_ship": pa.array([], type=pa.int64()),
                 "o_us": pa.array([], type=pa.int64()),
                 "prio": pa.array([], type=pa.string()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "o_orderkey" not in t.column_names:
                return empty
            kk = t.column("o_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            n = len(kk)
            return pa.table(
                {"key": pa.array(kk),
                 "max_ship": pa.array(np.zeros(n, dtype=np.int64)),
                 "o_us": t.column("o_orderdate").cast(pa.int64()),
                 "prio": t.column("o_orderpriority"),
                 "kind": pa.array(np.zeros(n, dtype=np.int8),
                                  type=pa.int8()),
                 "bucket": pa.array(
                     (((kk.astype(np.uint64) * _MIX)
                       >> np.uint64(48)).astype(np.int64))
                     % n_buckets)}
            )

        def bucket_lag(g: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            kind = g.column("kind").to_numpy(zero_copy_only=False)
            li_t = g.filter(pa.array(kind == 1))
            o_t = g.filter(pa.array(kind == 0))
            lk = li_t.column("key").to_numpy(zero_copy_only=False)
            ls = li_t.column("max_ship").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ok_keys = o_t.column("key").to_numpy(zero_copy_only=False)
            # per-key max ship via sort + reduceat, then a sorted
            # searchsorted lookup (int64 exact, replaces the pandas
            # groupby-max + map)
            if lk.size == 0 or ok_keys.size == 0:
                return pa.table(
                    {"prio": pa.array([], type=pa.string()),
                     "n": pa.array([], type=pa.int64()),
                     "sum_lag": pa.array([], type=pa.int64()),
                     "max_lag": pa.array([], type=pa.int64())}
                )
            order = np.argsort(lk, kind="stable")
            lk_s, ls_s = lk[order], ls[order]
            starts = np.flatnonzero(
                np.r_[True, lk_s[1:] != lk_s[:-1]]
            )
            uk = lk_s[starts]
            umax = np.maximum.reduceat(ls_s, starts)
            idx = np.clip(np.searchsorted(uk, ok_keys), 0,
                          uk.size - 1)
            ok = uk[idx] == ok_keys
            ship = umax[idx]
            o_us = o_t.column("o_us").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            lag = (ship[ok] - o_us[ok]) // DAY_US
            o_ok = o_t.filter(pa.array(ok))
            tab = pa.table(
                {"prio": o_ok.column("prio"),
                 "lag": pa.array(lag, type=pa.int64())}
            )
            a = tab.group_by("prio").aggregate(
                [("lag", "count"), ("lag", "sum"), ("lag", "max")]
            )
            return pa.table(
                {"prio": a.column("prio"),
                 "n": a.column("lag_count").cast(pa.int64()),
                 "sum_lag": a.column("lag_sum").cast(pa.int64()),
                 "max_lag": a.column("lag_max").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("prio").aggregate(
                [("n", "sum"), ("sum_lag", "sum"),
                 ("max_lag", "max")]
            )
            return pa.table(
                {"prio": g.column("prio"),
                 "n": g.column("n_sum").cast(pa.int64()),
                 "sum_lag": g.column("sum_lag_sum").cast(pa.int64()),
                 "max_lag": g.column("max_lag_max").cast(pa.int64())}
            )

        li = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(li_partial, batch_format="pyarrow")
        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(o_prep, batch_format="pyarrow")
        refs = list(
            orders.union(li)
            .groupby("bucket")
            .map_groups(bucket_lag, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        n = a["n"].to_numpy(np.int64)
        s = a["sum_lag"].to_numpy(np.int64)
        return pa.table(
            {"prio": pa.array(a["prio"], type=pa.string()),
             "n": pa.array(n),
             "sum_lag_days": pa.array(s),
             "max_lag_days": pa.array(
                 a["max_lag"].to_numpy(np.int64)),
             "mean_lag_days": pa.array(
                 s.astype(np.float64) / n.astype(np.float64),
                 type=pa.float64())}
        )

    sql = """
    WITH lag_t AS (
        SELECT o.o_orderpriority AS prio,
               (epoch_us(max(l.l_shipdate))
                - epoch_us(o.o_orderdate)) // 86400000000 AS lag
        FROM orders o JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT prio, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(lag) AS BIGINT) AS sum_lag_days,
           CAST(max(lag) AS BIGINT) AS max_lag_days,
           CAST(sum(lag) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_lag_days
    FROM lag_t GROUP BY prio
    """
    return q, sql


def build_wave38_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_scd2_intervals",) + _scd2_query()))
    add(*(("events_window_dedup",) + _window_dedup_query()))
    add(*(("orders_fulfillment_lag",) + _fulfillment_lag_query()))
    return queries, oracles
