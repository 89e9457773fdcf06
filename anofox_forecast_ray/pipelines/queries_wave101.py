"""Wave-101 queries: total variation and temporal clustering ratio.

- doc_total_variation: TV = sum |y_t - y_(t-1)| (pure int64) and the
  smoothness ratio TV / ((n-1) * range) in [0, 1] — 0 for monotone
  ramps, ~2/3 for iid noise; the roughness number next to
  doc_mean_crossings.
- events_clustering_ratio: is the point process self-exciting? The
  observed share of inter-event gaps under 60 s against the
  exponential-null probability 1 - exp(-lambda * 60 s) with lambda =
  (n_gaps) / (sum of gaps): ratio > 1 means temporal clustering
  (Hawkes-like behavior). Gap counts and sums are exact int64 over
  the per-user bucketed kernel; exp is shared libm.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols

SHORT_GAP_US = 60_000_000


# ------------------------------------------------------- doc_total_variation
def _tv_query():
    def q(sf_dir: str):
        def tv(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "doc_id": pa.array([], type=pa.string()),
                "n_tok": pa.array([], type=pa.int64()),
                "total_variation": pa.array([], type=pa.int64()),
                "smoothness": pa.array([], type=pa.float64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            toks = t.column("tokens").combine_chunks()
            flat = toks.flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = toks.offsets.to_numpy(
                zero_copy_only=False).astype(np.int64)
            offs = offs - offs[0]
            lens = np.diff(offs)
            keep = lens >= 2
            if not keep.any():
                return empty
            ids = [d for d, k in zip(
                t.column("doc_id").to_pylist(), keep) if k]
            starts = offs[:-1][keep]
            dlens = lens[keep]
            nd = len(ids)
            tot = int(dlens.sum())
            g = np.repeat(np.arange(nd), dlens)
            pos = (np.arange(tot)
                   - np.repeat(np.cumsum(dlens) - dlens, dlens))
            y = flat[starts[g] + pos]
            d = np.abs(np.r_[np.int64(0), y[1:] - y[:-1]])
            first = pos == 0
            d[first] = 0
            tvv = np.bincount(g, weights=d,
                              minlength=nd).astype(np.int64)
            mn = np.full(nd, np.iinfo(np.int64).max)
            mx = np.full(nd, np.iinfo(np.int64).min)
            np.minimum.at(mn, g, y)
            np.maximum.at(mx, g, y)
            rng = mx - mn
            sm = np.where(
                rng > 0,
                tvv.astype(np.float64)
                / ((dlens - 1).astype(np.float64)
                   * np.maximum(rng, 1).astype(np.float64)),
                0.0)
            return pa.table({
                "doc_id": pa.array(ids, type=pa.string()),
                "n_tok": pa.array(dlens, type=pa.int64()),
                "total_variation": pa.array(tvv),
                "smoothness": pa.array(sm, type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            tv, batch_format="pyarrow")
        return _cast(ds, {
            "doc_id": pa.string(),
            "n_tok": pa.int64(),
            "total_variation": pa.int64(),
            "smoothness": pa.float64(),
        })

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    d AS (
        SELECT doc_id, token,
               token - lag(token) OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS df
        FROM tok
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(COALESCE(sum(abs(df)), 0) AS BIGINT) AS tv,
               CAST(max(token) - min(token) AS BIGINT) AS rng
        FROM d GROUP BY doc_id HAVING count(*) >= 2
    )
    SELECT doc_id, n AS n_tok, tv AS total_variation,
           CASE WHEN rng > 0
                THEN CAST(tv AS DOUBLE)
                     / (CAST(n - 1 AS DOUBLE)
                        * CAST(GREATEST(rng, 1) AS DOUBLE))
                ELSE 0.0e0 END AS smoothness
    FROM agg
    """
    return q, sql


# -------------------------------------------------- events_clustering_ratio
def _clustering_query(short_us: int = SHORT_GAP_US):
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

        def gaps(g: pa.Table) -> pa.Table:
            g = g.sort_by([("user_id", "ascending"),
                           ("tus", "ascending"),
                           ("event_id", "ascending")])
            users = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            same = users[1:] == users[:-1]
            gp = (tus[1:] - tus[:-1])[same]
            return pa.table({
                "n": pa.array([int(gp.size)], type=pa.int64()),
                "s": pa.array([int(gp.sum())], type=pa.int64()),
                "short": pa.array(
                    [int((gp < short_us).sum())],
                    type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            return pa.table({
                c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                for c in ("n", "s", "short")
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_id"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(gaps, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        n = int(a.column("n")[0].as_py())
        s = int(a.column("s")[0].as_py())
        short = int(a.column("short")[0].as_py())
        lam = float(n) / float(s)
        p_obs = float(short) / float(n)
        p_null = 1.0 - math.exp(-lam * float(short_us))
        ratio = p_obs / p_null if p_null > 0 else 0.0
        return pa.table({
            "n_gaps": pa.array([n], type=pa.int64()),
            "n_short": pa.array([short], type=pa.int64()),
            "p_observed": pa.array([p_obs], type=pa.float64()),
            "p_exponential": pa.array([p_null],
                                      type=pa.float64()),
            "clustering_ratio": pa.array([ratio],
                                         type=pa.float64()),
        })

    sql = f"""
    WITH g AS (
        SELECT epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS gap
        FROM events
    ),
    agg AS (
        SELECT CAST(count(gap) AS BIGINT) AS n,
               CAST(sum(gap) AS BIGINT) AS s,
               CAST(sum(CASE WHEN gap < {short_us}
                        THEN 1 ELSE 0 END) AS BIGINT) AS short
        FROM g WHERE gap IS NOT NULL
    )
    SELECT n AS n_gaps, short AS n_short,
           CAST(short AS DOUBLE) / CAST(n AS DOUBLE)
               AS p_observed,
           1.0e0 - exp(-(CAST(n AS DOUBLE) / CAST(s AS DOUBLE))
                       * {float(short_us)}e0) AS p_exponential,
           CASE WHEN 1.0e0 - exp(-(CAST(n AS DOUBLE)
                                   / CAST(s AS DOUBLE))
                                 * {float(short_us)}e0) > 0
                THEN (CAST(short AS DOUBLE) / CAST(n AS DOUBLE))
                     / (1.0e0 - exp(-(CAST(n AS DOUBLE)
                                      / CAST(s AS DOUBLE))
                                    * {float(short_us)}e0))
                ELSE 0.0e0 END AS clustering_ratio
    FROM agg
    """
    return q, sql


def build_wave101_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_total_variation",) + _tv_query()))
    add(*(("events_clustering_ratio",) + _clustering_query()))
    return queries, oracles
