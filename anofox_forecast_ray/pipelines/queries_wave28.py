"""Wave-28 queries: EXISTS semi-join, sliding-window distinct counts,
and mutual information between bounded categorical axes.

- orders_semijoin_late: TPC-H-Q4-shaped EXISTS semi-join — orders with
  any lineitem shipped > 60 days after the order date, counted by
  priority. The lineitem side collapses to per-orderkey MAX(shipdate)
  partials BEFORE the shuffle, so only distinct orderkeys move; the
  bucket kernel is a vectorized hash-bucket co-location (stages/join.py
  discipline), never a full join payload.
- events_sliding_distinct_24h: per event-hour, distinct users over the
  trailing 24 calendar hours. Exact sliding distinct: distinct
  (hour, user) pairs fan out to their <=24 covering windows, then one
  hash-bucket shuffle dedups (window, user) and emits additive per-
  window partial counts — a (w,user) pair lands in exactly one bucket,
  so the final merge is an integer sum, never a re-dedup.
- events_type_hour_mi: mutual information (nats) between event type and
  hour-of-day from bounded (type, hod) count partials. Every log
  argument is ONE f64 division of exact int64 products, and the sum
  over cells is a sequential left fold in (type, hod) order replayed by
  DuckDB list_reduce (the repo's float-fold discipline).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

_MIX = np.uint64(0x9E3779B97F4A7C15)


# ---------------------------------------------------- orders_semijoin_late
def _semijoin_late_query(late_days: int = 60, n_buckets: int = 64):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def li_partial(t: pa.Table) -> pa.Table:
            if "l_orderkey" not in t.column_names:
                return pa.table(
                    {"key": pa.array([], type=pa.int64()),
                     "max_ship": pa.array([], type=pa.int64()),
                     "o_us": pa.array([], type=pa.int64()),
                     "prio": pa.array([], type=pa.string()),
                     "kind": pa.array([], type=pa.int8()),
                     "bucket": pa.array([], type=pa.int64())}
                )
            tab = pa.table(
                {"key": t.column("l_orderkey").cast(pa.int64()),
                 "ship": t.column("l_shipdate").cast(pa.int64())}
            )
            g = tab.group_by("key").aggregate([("ship", "max")])
            k = g.column("key").to_numpy(zero_copy_only=False)
            n = len(k)
            return pa.table(
                {"key": g.column("key"),
                 "max_ship": g.column("ship_max").cast(pa.int64()),
                 "o_us": pa.array(
                     np.zeros(n, dtype=np.int64), type=pa.int64()),
                 "prio": pa.array([""] * n, type=pa.string()),
                 "kind": pa.array(
                     np.ones(n, dtype=np.int8), type=pa.int8()),
                 "bucket": pa.array(
                     (((k.astype(np.uint64) * _MIX) >> np.uint64(48))
                      .astype(np.int64)) % n_buckets)}
            )

        def o_prep(t: pa.Table) -> pa.Table:
            if "o_orderkey" not in t.column_names:
                return pa.table(
                    {"key": pa.array([], type=pa.int64()),
                     "max_ship": pa.array([], type=pa.int64()),
                     "o_us": pa.array([], type=pa.int64()),
                     "prio": pa.array([], type=pa.string()),
                     "kind": pa.array([], type=pa.int8()),
                     "bucket": pa.array([], type=pa.int64())}
                )
            k = t.column("o_orderkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            n = len(k)
            return pa.table(
                {"key": pa.array(k),
                 "max_ship": pa.array(
                     np.zeros(n, dtype=np.int64), type=pa.int64()),
                 "o_us": t.column("o_orderdate").cast(pa.int64()),
                 "prio": t.column("o_orderpriority"),
                 "kind": pa.array(
                     np.zeros(n, dtype=np.int8), type=pa.int8()),
                 "bucket": pa.array(
                     (((k.astype(np.uint64) * _MIX) >> np.uint64(48))
                      .astype(np.int64)) % n_buckets)}
            )

        def bucket_semi(g: pa.Table) -> pa.Table:
            # per-key max shipdate via sort+reduceat, sorted lookup onto
            # the orders side, per-prio counts via Arrow hash aggregate
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            li = g.filter(pa.array(kind == 1))
            o = g.filter(pa.array(kind == 0))
            lk = li.column("key").to_numpy(zero_copy_only=False)
            ls = li.column("max_ship").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ok = o.column("key").to_numpy(zero_copy_only=False)
            o_us = o.column("o_us").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            empty = pa.table(
                {"prio": pa.array([], type=pa.string()),
                 "n_late": pa.array([], type=pa.int64())}
            )
            if lk.size == 0 or ok.size == 0:
                return empty
            order = np.argsort(lk, kind="stable")
            lk_s, ls_s = lk[order], ls[order]
            starts = np.flatnonzero(
                np.r_[True, lk_s[1:] != lk_s[:-1]]
            )
            uk = lk_s[starts]
            umax = np.maximum.reduceat(ls_s, starts)
            idx = np.clip(np.searchsorted(uk, ok), 0, uk.size - 1)
            hit = uk[idx] == ok
            late = hit & (umax[idx] > o_us
                          + late_days * 86_400_000_000)
            if not late.any():
                return empty
            a = o.filter(pa.array(late)).select(["prio"])
            a = a.append_column(
                "one", pa.array(np.ones(a.num_rows, dtype=np.int64))
            ).group_by("prio").aggregate([("one", "sum")])
            return pa.table(
                {"prio": a.column("prio"),
                 "n_late": a.column("one_sum").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("prio").aggregate([("n_late", "sum")])
            return pa.table(
                {"prio": g.column("prio"),
                 "n_late": g.column("n_late_sum").cast(pa.int64())}
            )

        li = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(li_partial, batch_format="pyarrow")
        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(o_prep, batch_format="pyarrow")
        refs = list(
            orders.union(li)
            .groupby("bucket")
            .map_groups(bucket_semi, batch_format="pyarrow")
            .to_arrow_refs()
        )
        out = tree_reduce_tables(refs, merge)
        return pa.table(
            {"prio": out.column("prio").cast(pa.string()),
             "n_late": out.column("n_late").cast(pa.int64())}
        )

    sql = f"""
    SELECT o_orderpriority AS prio,
           CAST(count(*) AS BIGINT) AS n_late
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY
    )
    GROUP BY o_orderpriority
    """
    return q, sql


# -------------------------------------- events_sliding_distinct_24h
def _sliding_distinct_query(window_hours: int = 24, n_buckets: int = 256):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        SHIFT = np.int64(40)  # key = window << 40 | user (user < 2^40)

        def pairs(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"bucket": pa.array([], type=pa.int64()),
                     "wkey": pa.array([], type=pa.int64())}
                )
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            user = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hk = np.unique((hour << SHIFT) | user)
            h = hk >> SHIFT
            u = hk & ((np.int64(1) << SHIFT) - 1)
            # fan out each distinct (hour, user) to its covering windows
            w = (h[:, None]
                 + np.arange(window_hours, dtype=np.int64)[None, :]
                 ).ravel()
            uu = np.repeat(u, window_hours)
            wkey = np.unique((w << SHIFT) | uu)
            b = (((wkey.astype(np.uint64) * _MIX) >> np.uint64(48))
                 .astype(np.int64)) % n_buckets
            return pa.table(
                {"bucket": pa.array(b), "wkey": pa.array(wkey)}
            )

        def bucket_count(g: pa.Table) -> pa.Table:
            wk = np.unique(
                g.column("wkey").to_numpy(zero_copy_only=False)
            )
            w = wk >> SHIFT
            uw, cnt = np.unique(w, return_counts=True)
            return pa.table(
                {"window": pa.array(uw, type=pa.int64()),
                 "n_users": pa.array(cnt.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("window").aggregate([("n_users", "sum")])
            return pa.table(
                {"window": g.column("window"),
                 "n_users": g.column("n_users_sum").cast(pa.int64())}
            )

        def hours_partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table({"hour": pa.array([], type=pa.int64())})
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            return pa.table({"hour": pa.array(np.unique(hour))})

        def hours_merge(t: pa.Table) -> pa.Table:
            return pa.table(
                {"hour": pa.array(np.unique(
                    t.column("hour").to_numpy(zero_copy_only=False)))}
            )

        def read():
            return read_cols(sf_dir, "events", ["ts", "user_id"])

        refs = list(
            read().map_batches(pairs, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_count, batch_format="pyarrow")
            .to_arrow_refs()
        )
        counts = tree_reduce_tables(refs, merge).to_pandas()
        hrefs = list(
            read().map_batches(hours_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hours = set(
            tree_reduce_tables(hrefs, hours_merge)
            .column("hour").to_pylist()
        )
        counts = counts[counts["window"].isin(hours)].sort_values(
            "window"
        )
        return pa.table(
            {"hour": pa.array(counts["window"].to_numpy(np.int64)),
             "n_users": pa.array(
                 counts["n_users"].to_numpy(np.int64))}
        )

    sql = f"""
    WITH eh AS (
        SELECT DISTINCT epoch_us(ts) // 1000000 // 3600 AS hour,
               user_id
        FROM events
    ),
    hours AS (SELECT DISTINCT hour FROM eh)
    SELECT CAST(h.hour AS BIGINT) AS hour,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM hours h JOIN eh e
      ON e.hour BETWEEN h.hour - {window_hours - 1} AND h.hour
    GROUP BY h.hour
    """
    return q, sql


# ------------------------------------------------ events_type_hour_mi
def _type_hour_mi_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"event_type": pa.array([], type=pa.string()),
                     "hod": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            hod = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600) % 24
            tab = pa.table(
                {"event_type": t.column("event_type"),
                 "hod": pa.array(hod)}
            )
            g = tab.group_by(["event_type", "hod"]).aggregate(
                [("hod", "count")]
            )
            return pa.table(
                {"event_type": g.column("event_type"),
                 "hod": g.column("hod"),
                 "cnt": g.column("hod_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "hod"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"event_type": g.column("event_type"),
                 "hod": g.column("hod"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        cells = cells.sort_values(["event_type", "hod"])
        n = int(cells["cnt"].sum())
        r = cells.groupby("event_type")["cnt"].sum().to_dict()
        c = cells.groupby("hod")["cnt"].sum().to_dict()
        mi = 0.0  # sequential left fold in (type, hod) order
        for row in cells.itertuples():
            cij = int(row.cnt)
            term = ((float(cij) / float(n))
                    * math.log(float(cij * n)
                               / float(r[row.event_type]
                                       * c[row.hod])))
            mi = mi + term
        return pa.table(
            {"n_events": pa.array([n], type=pa.int64()),
             "mi_nats": pa.array([mi], type=pa.float64())}
        )

    sql = """
    WITH cells AS (
        SELECT event_type,
               (epoch_us(ts) // 1000000 // 3600) % 24 AS hod,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
    rows_m AS (
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS r FROM cells
        GROUP BY event_type
    ),
    cols_m AS (
        SELECT hod, CAST(sum(cnt) AS BIGINT) AS c FROM cells
        GROUP BY hod
    ),
    terms AS (
        SELECT ce.event_type, ce.hod,
               (CAST(ce.cnt AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * ln(CAST(ce.cnt * tot.n AS DOUBLE)
                    / CAST(rm.r * cm.c AS DOUBLE)) AS term
        FROM cells ce
        JOIN rows_m rm ON rm.event_type = ce.event_type
        JOIN cols_m cm ON cm.hod = ce.hod
        CROSS JOIN tot
    ),
    folded AS (
        SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(term ORDER BY event_type, hod)),
                   (a, b) -> a + b) AS mi
        FROM terms
    )
    SELECT tot.n AS n_events, folded.mi AS mi_nats
    FROM tot, folded
    """
    return q, sql


def build_wave28_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_semijoin_late",) + _semijoin_late_query(60)))
    add(*(("events_sliding_distinct_24h",) + _sliding_distinct_query(24)))
    add(*(("events_type_hour_mi",) + _type_hour_mi_query()))
    return queries, oracles
