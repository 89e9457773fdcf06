"""Wave-94 queries: dormancy revivals and price endings.

- events_revivals: dormancy-revival detection per user — events
  arriving after a gap > 2 days (the win-back metric): per-user
  revival counts plus the maximum gap, all int64 microsecond
  arithmetic over the bucketed per-user kernel. (A numeric-literal
  extraction query was considered and dropped: this corpus's text
  contains zero digits, so the operator would be data-degenerate;
  events_props_extract already covers typed extraction.)
- orders_price_endings: distribution of the cents part (price % 1
  dollar) of order totals — the psychological-pricing audit: top-5
  endings by count with (count desc, ending asc) ties. Pure integer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

TOPK_ENDINGS = 5


# ---------------------------------------------------------------- events_revivals
def _revivals_query(days: int = 2):
    gap_us = days * 86_400_000_000

    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_id": t.column("event_id").cast(pa.int64())}
            )

        def revivals(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            same = users[1:] == users[:-1]
            gaps = (tus[1:] - tus[:-1])
            gd = users[1:]
            rev = same & (gaps > gap_us)
            uk = np.unique(users)
            idx = np.searchsorted(uk, gd[rev])
            n_rev = np.bincount(idx, minlength=uk.size).astype(
                np.int64)
            mx = np.zeros(uk.size, dtype=np.int64)
            np.maximum.at(
                mx, np.searchsorted(uk, gd[same]), gaps[same])
            keep = n_rev > 0
            return pa.table({
                "user_id": pa.array(
                    np.r_[uk[keep], np.int64(-1)]),
                "n_revivals": pa.array(
                    np.r_[n_rev[keep], np.int64(0)]),
                "max_gap_us": pa.array(
                    np.r_[mx[keep], np.int64(0)]),
            })

        def merge(t: pa.Table) -> pa.Table:
            return t

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(revivals, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[a["user_id"] >= 0].sort_values(
            "user_id").reset_index(drop=True)
        return pa.table({
            "user_id": pa.array(a["user_id"].to_numpy(np.int64)),
            "n_revivals": pa.array(
                a["n_revivals"].to_numpy(np.int64)),
            "max_gap_us": pa.array(
                a["max_gap_us"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS gap
        FROM events
    )
    SELECT user_id,
           CAST(sum(CASE WHEN gap > {gap_us}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_revivals,
           CAST(max(gap) AS BIGINT) AS max_gap_us
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
    HAVING sum(CASE WHEN gap > {gap_us} THEN 1 ELSE 0 END) > 0
    """
    return q, sql


# ---------------------------------------------------------- orders_price_endings
def _price_endings_query(topk: int = TOPK_ENDINGS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if ("o_totalprice" not in t.column_names
                    or t.num_rows == 0):
                return pa.table({
                    "ending": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0).astype(np.int64)
            end = cents % 100
            uk, cnt = np.unique(end, return_counts=True)
            return pa.table({
                "ending": pa.array(uk),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("ending").aggregate([("cnt", "sum")])
            return pa.table({
                "ending": g.column("ending").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values(["cnt", "ending"],
                          ascending=[False, True]).head(topk)
        return pa.table({
            "ending": pa.array(a["ending"].to_numpy(np.int64)),
            "cnt": pa.array(a["cnt"].to_numpy(np.int64)),
        })

    sql = f"""
    WITH e AS (
        SELECT CAST(round_even(o_totalprice * 100, 0) AS BIGINT)
               % 100 AS ending,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY ending
    )
    SELECT ending, cnt FROM e
    ORDER BY cnt DESC, ending ASC LIMIT {topk}
    """
    return q, sql


def build_wave94_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_revivals",) + _revivals_query()))
    add(*(("orders_price_endings",) + _price_endings_query()))
    return queries, oracles
