"""Wave-51 queries: exponential decay fit and decile-segmented metrics.

- events_dau_decay_fit: log-linear OLS fit of the daily-active-users
  curve, ln(DAU_t) = a + b*t — the growth-analytics decay/half-life
  estimate. Day indices are exact ints; ln(DAU) uses scalar math.log;
  the four OLS moment sums fold over days in ascending order and the
  slope is the identical f64 expression, replayed by list_reduce.
- events_error_by_activity_decile: error rate segmented by user
  activity decile — decile boundaries are NEAREST-RANK order stats of
  per-user event counts (streaming exact_order_stats, no driver
  sort), then bounded (decile) cells aggregate error/total counts.
  The segmentation every metrics warehouse runs, end to end exact.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

DAY_US = 86_400_000_000
N_DECILES = 10


# ------------------------------------------------------ events_dau_decay_fit
def _dau_decay_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"key": pa.array([], type=pa.int64())}
                )
            day = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // DAY_US)
            user = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {"key": pa.array(np.unique(
                    (day << np.int64(40)) | user))}
            )

        def bucket_cnt(t: pa.Table) -> pa.Table:
            k = np.unique(
                t.column("key").to_numpy(zero_copy_only=False)
            )
            d = k >> np.int64(40)
            ud, uc = np.unique(d, return_counts=True)
            return pa.table(
                {"day": pa.array(ud),
                 "dau": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate([("dau", "sum")])
            return pa.table(
                {"day": g.column("day"),
                 "dau": g.column("dau_sum").cast(pa.int64())}
            )

        # one bucket shuffle dedups (day, user) globally: a pair lands
        # in exactly one bucket, so per-day partial counts are additive
        def dedup_bucket(g: pa.Table) -> pa.Table:
            return bucket_cnt(g)

        def add_bucket(t: pa.Table) -> pa.Table:
            if "key" not in t.column_names:
                return pa.table(
                    {"b": pa.array([], type=pa.int64()),
                     "key": pa.array([], type=pa.int64())}
                )
            k = t.column("key").to_numpy(zero_copy_only=False)
            b = ((k.astype(np.uint64)
                  * np.uint64(0x9E3779B97F4A7C15))
                 >> np.uint64(48)).astype(np.int64) % 256
            return pa.table(
                {"b": pa.array(b), "key": t.column("key")}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b")
            .map_groups(dedup_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "day"
        )
        days = a["day"].to_numpy(np.int64)
        dau = a["dau"].to_numpy(np.int64)
        d0 = int(days[0])
        x = (days - d0).astype(np.int64)
        n = int(x.size)
        sx = int(x.sum())
        sxx = int((x * x).sum())
        sy = 0.0
        sxy = 0.0
        for xi, yi in zip(x, dau):  # ascending-day fold
            ly = math.log(float(int(yi)))
            sy = sy + ly
            sxy = sxy + float(int(xi)) * ly
        num = float(n) * sxy - float(sx) * sy
        den = float(n * sxx - sx * sx)
        slope = num / den
        return pa.table(
            {"n_days": pa.array([n], type=pa.int64()),
             "slope": pa.array([slope], type=pa.float64()),
             "half_life_days": pa.array(
                 [(-math.log(2.0) / slope) if slope < 0 else
                  float("inf")],
                 type=pa.float64())}
        )

    sql = f"""
    WITH du AS (
        SELECT DISTINCT epoch_us(ts) // {DAY_US} AS day, user_id
        FROM events
    ),
    dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du
        GROUP BY day
    ),
    d0 AS (SELECT min(day) AS d0 FROM dau),
    pts AS (
        SELECT CAST(dau.day - d0.d0 AS BIGINT) AS x,
               ln(CAST(dau.dau AS DOUBLE)) AS y
        FROM dau, d0
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(y ORDER BY x)), (a, b) -> a + b) AS sy,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(CAST(x AS DOUBLE) * y ORDER BY x)),
                   (a, b) -> a + b) AS sxy
        FROM pts
    )
    SELECT n AS n_days,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
           CASE WHEN (CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * sy)
                     / CAST(n * sxx - sx * sx AS DOUBLE) < 0
                THEN -ln(2.0)
                     / ((CAST(n AS DOUBLE) * sxy
                         - CAST(sx AS DOUBLE) * sy)
                        / CAST(n * sxx - sx * sx AS DOUBLE))
                ELSE CAST('inf' AS DOUBLE)
           END AS half_life_days
    FROM mom
    """
    return q, sql


# ------------------------------------------ events_error_by_activity_decile
def _error_decile_query(n_dec: int = N_DECILES):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.quantile import exact_order_stats
        from ..stages.source_rollup import tree_reduce_tables

        def user_partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "n_err": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            et = np.asarray(t.column("event_type").to_pylist())
            err = (et == "error").astype(np.int64)
            g = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "one": pa.array(np.ones(len(et), dtype=np.int64)),
                 "err": pa.array(err)}
            ).group_by("user_id").aggregate(
                [("one", "sum"), ("err", "sum")]
            )
            return pa.table(
                {"user_id": g.column("user_id"),
                 "n": g.column("one_sum").cast(pa.int64()),
                 "n_err": g.column("err_sum").cast(pa.int64())}
            )

        def merge_bucket(g: pa.Table) -> pa.Table:
            a = g.group_by("user_id").aggregate(
                [("n", "sum"), ("n_err", "sum")]
            )
            return pa.table(
                {"user_id": a.column("user_id"),
                 "n": a.column("n_sum").cast(pa.int64()),
                 "n_err": a.column("n_err_sum").cast(pa.int64())}
            )

        def read_users():
            return (
                read_cols(sf_dir, "events", ["user_id", "event_type"])
                .map_batches(user_partial, batch_format="pyarrow")
                .map_batches(_add_user_bucket,
                             batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(merge_bucket, batch_format="pyarrow")
            )

        users_ds = read_users().materialize()
        n_users = users_ds.count()

        def keys_ds():
            def proj(t: pa.Table) -> pa.Table:
                if "n" not in t.column_names:
                    return pa.table(
                        {"key": pa.array([], type=pa.int64())}
                    )
                return pa.table({"key": t.column("n")})

            return users_ds.map_batches(proj,
                                        batch_format="pyarrow")

        ranks = sorted(
            {-(-k * n_users // n_dec) - 1
             for k in range(1, n_dec)}
        )
        st = exact_order_stats(lambda: keys_ds(), ranks)
        bounds = [st[-(-k * n_users // n_dec) - 1]
                  for k in range(1, n_dec)]
        barr = np.asarray(bounds, dtype=np.int64)

        def assign(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names:
                return pa.table(
                    {"decile": pa.array([], type=pa.int64()),
                     "n_users": pa.array([], type=pa.int64()),
                     "n_events": pa.array([], type=pa.int64()),
                     "n_errors": pa.array([], type=pa.int64())}
                )
            n = t.column("n").to_numpy(zero_copy_only=False)
            ne = t.column("n_err").to_numpy(zero_copy_only=False)
            dec = np.searchsorted(barr, n, side="left").astype(
                np.int64
            )
            g = pa.table(
                {"decile": pa.array(dec),
                 "one": pa.array(np.ones(n.size, dtype=np.int64)),
                 "n": pa.array(n.astype(np.int64)),
                 "ne": pa.array(ne.astype(np.int64))}
            ).group_by("decile").aggregate(
                [("one", "sum"), ("n", "sum"), ("ne", "sum")]
            )
            return pa.table(
                {"decile": g.column("decile"),
                 "n_users": g.column("one_sum").cast(pa.int64()),
                 "n_events": g.column("n_sum").cast(pa.int64()),
                 "n_errors": g.column("ne_sum").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("decile").aggregate(
                [("n_users", "sum"), ("n_events", "sum"),
                 ("n_errors", "sum")]
            )
            return pa.table(
                {"decile": g.column("decile"),
                 "n_users": g.column("n_users_sum").cast(pa.int64()),
                 "n_events":
                     g.column("n_events_sum").cast(pa.int64()),
                 "n_errors":
                     g.column("n_errors_sum").cast(pa.int64())}
            )

        refs = list(
            users_ds.map_batches(assign, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "decile"
        )
        ne = a["n_events"].to_numpy(np.int64)
        nr = a["n_errors"].to_numpy(np.int64)
        return pa.table(
            {"decile": pa.array(a["decile"].to_numpy(np.int64)),
             "n_users": pa.array(
                 a["n_users"].to_numpy(np.int64)),
             "n_events": pa.array(ne),
             "n_errors": pa.array(nr),
             "error_rate": pa.array(
                 nr.astype(np.float64) / ne.astype(np.float64),
                 type=pa.float64())}
        )

    sql = f"""
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1
                        ELSE 0 END) AS BIGINT) AS n_err
        FROM events GROUP BY user_id
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
    b AS (
        SELECT k.k,
               (SELECT n FROM (
                    SELECT n, row_number() OVER (ORDER BY n) AS rk
                    FROM u)
                WHERE rk = CAST(ceil(k.k * nn.nu / {float(n_dec)!r})
                                AS BIGINT)) AS bound
        FROM (SELECT unnest(range(1, {n_dec})) AS k) k
        CROSS JOIN nn
    ),
    dec AS (
        SELECT u.user_id, u.n, u.n_err,
               CAST(COALESCE((SELECT count(*) FROM b
                              WHERE b.bound < u.n), 0) AS BIGINT)
                   AS decile
        FROM u
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(n_err) AS BIGINT) AS n_errors,
           CAST(sum(n_err) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
               AS error_rate
    FROM dec GROUP BY decile
    """
    return q, sql


def build_wave51_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_dau_decay_fit",) + _dau_decay_query()))
    add(*(("events_error_by_activity_decile",)
          + _error_decile_query()))
    return queries, oracles
