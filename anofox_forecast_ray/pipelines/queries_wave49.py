"""Wave-49 queries: conversion-window sweep and Markov entropy rate.

- events_conversion_windows: conversion rate as a function of the
  attribution window — for w in {1, 2, 4, 8, 24} hours, how many users
  purchase within w of their first view. Per-user (first view, first
  purchase) partials collapse before the shuffle; the sweep is five
  vectorized comparisons per bucket, all integers, rates one division.
- events_markov_entropy: entropy rate of the empirical event-type
  transition chain, H = -sum_i pi_i sum_j P_ij ln P_ij with pi the
  empirical row marginals — bounded (from, to) transition counts
  (consecutive events per user in (ts, event_id) order), probabilities
  as single divisions, folds ordered by (from, to) and replayed by
  list_reduce.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

WINDOWS_H = (1, 2, 4, 8, 24)


# ------------------------------------------------ events_conversion_windows
def _conversion_windows_query(windows_h=WINDOWS_H):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "v": pa.array([], type=pa.int64()),
                 "p": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            et = np.asarray(t.column("event_type").to_pylist())
            keep = (et == "view") | (et == "purchase")
            if not keep.any():
                return empty
            sub = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "tus": t.column("ts").cast(pa.int64()),
                 "is_v": pa.array((et == "view").astype(np.int8),
                                  type=pa.int8())}
            ).filter(pa.array(keep))
            df = sub.to_pandas()
            BIG = np.int64(1) << 62
            df["v"] = np.where(df["is_v"] == 1, df["tus"], BIG)
            df["p"] = np.where(df["is_v"] == 0, df["tus"], BIG)
            a = (df.groupby("user_id")
                 .agg(v=("v", "min"), p=("p", "min")).reset_index())
            return pa.Table.from_pandas(a, preserve_index=False)

        def sweep(g: pa.Table) -> pa.Table:
            a = g.group_by("user_id").aggregate(
                [("v", "min"), ("p", "min")]
            )
            BIG = np.int64(1) << 62
            v = a.column("v_min").to_numpy(zero_copy_only=False)
            p = a.column("p_min").to_numpy(zero_copy_only=False)
            viewers = v < BIG
            conv = viewers & (p < BIG) & (p > v)
            delta = np.where(conv, p - v, np.int64(1) << 62)
            rows = []
            for w in windows_h:
                w_us = w * 3_600_000_000
                rows.append(
                    (int(w), int(viewers.sum()),
                     int((delta <= w_us).sum()))
                )
            return pa.table(
                {"window_h": pa.array([r[0] for r in rows],
                                      type=pa.int64()),
                 "n_viewers": pa.array([r[1] for r in rows],
                                       type=pa.int64()),
                 "n_conv": pa.array([r[2] for r in rows],
                                    type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("window_h").aggregate(
                [("n_viewers", "sum"), ("n_conv", "sum")]
            )
            return pa.table(
                {"window_h": g.column("window_h"),
                 "n_viewers":
                     g.column("n_viewers_sum").cast(pa.int64()),
                 "n_conv": g.column("n_conv_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(sweep, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "window_h"
        )
        nv = a["n_viewers"].to_numpy(np.int64)
        nc = a["n_conv"].to_numpy(np.int64)
        return pa.table(
            {"window_h": pa.array(
                a["window_h"].to_numpy(np.int64)),
             "n_viewers": pa.array(nv),
             "n_conv": pa.array(nc),
             "rate": pa.array(
                 nc.astype(np.float64) / nv.astype(np.float64),
                 type=pa.float64())}
        )

    wlist = ", ".join(str(w) for w in windows_h)
    sql = f"""
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN epoch_us(ts) END) AS v,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id
    ),
    w AS (SELECT unnest([{wlist}]) AS window_h)
    SELECT CAST(w.window_h AS BIGINT) AS window_h,
           CAST(sum(CASE WHEN f.v IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_viewers,
           CAST(sum(CASE WHEN f.v IS NOT NULL AND f.p IS NOT NULL
                         AND f.p > f.v
                         AND f.p - f.v
                             <= w.window_h * 3600000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_conv,
           CAST(sum(CASE WHEN f.v IS NOT NULL AND f.p IS NOT NULL
                         AND f.p > f.v
                         AND f.p - f.v
                             <= w.window_h * 3600000000
                    THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(sum(CASE WHEN f.v IS NOT NULL THEN 1
                          ELSE 0 END) AS DOUBLE) AS rate
    FROM w CROSS JOIN f
    GROUP BY w.window_h
    """
    return q, sql


# -------------------------------------------------- events_markov_entropy
def _markov_entropy_query():
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

        def transitions(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            same = users[1:] == users[:-1]
            src = et[:-1][same]
            dst = et[1:][same]
            if src.size == 0:
                return pa.table(
                    {"f": pa.array([""], type=pa.string()),
                     "t": pa.array([""], type=pa.string()),
                     "cnt": pa.array([0], type=pa.int64())}
                )
            key = np.char.add(np.char.add(
                src.astype(str), "|"), dst.astype(str))
            uk, uc = np.unique(key, return_counts=True)
            parts = np.char.partition(uk, "|")
            return pa.table(
                {"f": pa.array(list(parts[:, 0]) + [""],
                               type=pa.string()),
                 "t": pa.array(list(parts[:, 2]) + [""],
                               type=pa.string()),
                 "cnt": pa.array(
                     np.r_[uc.astype(np.int64), 0])}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["f", "t"]).aggregate([("cnt", "sum")])
            return pa.table(
                {"f": g.column("f"), "t": g.column("t"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(transitions, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a[(a["f"] != "") & (a["cnt"] > 0)].sort_values(
            ["f", "t"]
        )
        n = int(a["cnt"].sum())
        row = a.groupby("f")["cnt"].sum().to_dict()
        h = 0.0  # fold ordered by (f, t)
        for r in a.itertuples():
            pij = float(int(r.cnt)) / float(row[r.f])
            pi = float(row[r.f]) / float(n)
            h = h + pi * pij * math.log(pij)
        return pa.table(
            {"n_transitions": pa.array([n], type=pa.int64()),
             "entropy_rate": pa.array([-h], type=pa.float64())}
        )

    sql = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        FROM events
    ),
    tr AS (
        SELECT event_type AS f,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY tus, event_id) AS t
        FROM e
    ),
    c AS (
        SELECT f, t, CAST(count(*) AS BIGINT) AS cnt FROM tr
        WHERE t IS NOT NULL GROUP BY f, t
    ),
    rowm AS (
        SELECT f, CAST(sum(cnt) AS BIGINT) AS r FROM c GROUP BY f
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
    terms AS (
        SELECT c.f, c.t,
               (CAST(rm.r AS DOUBLE) / CAST(tot.n AS DOUBLE))
               * (CAST(c.cnt AS DOUBLE) / CAST(rm.r AS DOUBLE))
               * ln(CAST(c.cnt AS DOUBLE) / CAST(rm.r AS DOUBLE))
                   AS term
        FROM c JOIN rowm rm ON rm.f = c.f CROSS JOIN tot
    )
    SELECT tot.n AS n_transitions,
           -list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list(term ORDER BY f, t)),
               (a, b) -> a + b) AS entropy_rate
    FROM terms CROSS JOIN tot
    GROUP BY tot.n
    """
    return q, sql


def build_wave49_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_conversion_windows",)
          + _conversion_windows_query()))
    add(*(("events_markov_entropy",) + _markov_entropy_query()))
    return queries, oracles
