"""Wave-35 queries: gaps-and-islands (two flavors), TPC-H Q6 revenue,
and RFM customer segmentation.

- doc_longest_run: longest run of equal consecutive tokens per doc —
  the gaps-and-islands pattern. Engine: vectorized run-length
  boundaries over the flat buffer; oracle: the classic
  pos - row_number() island-id trick.
- events_activity_islands: per user, contiguous-hour activity islands
  (count + longest). Distinct hours reduce per block BEFORE the
  shuffle; islands are diffs == 1 runs inside the user-bucket kernel.
- lineitem_q6_revenue: TPC-H Q6 — predicate-pushdown scan with an
  exact integer revenue: price-cents x discount-basis-points products
  summed in int64, the headline f64 value derived by one division.
- events_rfm_segments: RFM segmentation — per-user recency/frequency/
  monetary aggregates (bucketed, partial-combined, materialized once),
  tercile boundaries by NEAREST RANK over each dimension via the
  streaming exact-order-stat machinery (the per-user table is
  unbounded at scale, so boundaries must never require a driver-side
  sort), then bounded (r,f,m)-cell counts. Everything integer; the
  judged output is the 27-cell segment histogram.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _cast, _num_read_blocks, corpus_ds
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket


# ------------------------------------------------------------ doc_longest_run
def _longest_run_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens

        def runs(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tok": pa.array([], type=pa.int64()),
                 "n_runs": pa.array([], type=pa.int64()),
                 "longest": pa.array([], type=pa.int64())}
            )
            if "tokens" not in t.column_names:
                return empty
            values, lengths = _flat_tokens(t)
            if values.size == 0:
                return empty
            v = values.astype(np.int64)
            lens = lengths.astype(np.int64)
            seg = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
            # run boundary where value changes OR doc changes
            brk = np.r_[
                True, (v[1:] != v[:-1]) | (seg[1:] != seg[:-1])
            ]
            run_start = np.flatnonzero(brk)
            run_len = np.diff(np.r_[run_start, v.size])
            run_seg = seg[run_start]
            # per-doc: number of runs and max run length
            keep = lens > 0
            doc_first_run = np.searchsorted(
                run_seg, np.arange(lens.size)[keep]
            )
            n_runs = np.diff(
                np.r_[doc_first_run, run_seg.size]
            )
            longest = np.maximum.reduceat(run_len, doc_first_run)
            ids = np.asarray(
                [int(x) for x in t.column("doc_id").to_pylist()],
                dtype=np.int64,
            )[keep]
            return pa.table(
                {"doc_id": pa.array(ids),
                 "n_tok": pa.array(lens[keep]),
                 "n_runs": pa.array(n_runs.astype(np.int64)),
                 "longest": pa.array(longest)}
            )

        return _cast(
            corpus_ds(sf_dir).map_batches(runs,
                                          batch_format="pyarrow"),
            {"doc_id": pa.int64(), "n_tok": pa.int64(),
             "n_runs": pa.int64(), "longest": pa.int64()},
        )

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    isl AS (
        SELECT doc_id, token,
               pos - row_number() OVER (PARTITION BY doc_id, token
                                        ORDER BY pos) AS island
        FROM tok
    ),
    r AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
        FROM isl GROUP BY doc_id, token, island
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(sum(run_len) AS BIGINT) AS n_tok,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS longest
    FROM r GROUP BY doc_id
    """
    return q, sql


# ------------------------------------------------- events_activity_islands
def _activity_islands_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def pairs(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"user_id": pa.array([], type=pa.int64()),
                     "hour": pa.array([], type=pa.int64())}
                )
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            user = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            key = np.unique((user << np.int64(24)) | hour)
            return pa.table(
                {"user_id": pa.array(key >> np.int64(24)),
                 "hour": pa.array(key & ((np.int64(1) << 24) - 1))}
            )

        def islands(g: pa.Table) -> pa.Table:
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            h = g.column("hour").to_numpy(zero_copy_only=False)
            # global dedup: a (user, hour) pair may arrive from many
            # blocks' partials
            key = (u << np.int64(24)) | h
            key = np.unique(key)
            u = key >> np.int64(24)
            h = key & ((np.int64(1) << 24) - 1)
            brk = np.r_[
                True, (u[1:] != u[:-1]) | (h[1:] != h[:-1] + 1)
            ]
            isl_start = np.flatnonzero(brk)
            isl_len = np.diff(np.r_[isl_start, u.size])
            isl_user = u[isl_start]
            ustart = np.flatnonzero(
                np.r_[True, isl_user[1:] != isl_user[:-1]]
            )
            n_islands = np.diff(np.r_[ustart, isl_user.size])
            longest = np.maximum.reduceat(isl_len, ustart)
            active = np.add.reduceat(isl_len, ustart)
            return pa.table(
                {"user_id": pa.array(isl_user[ustart],
                                     type=pa.int64()),
                 "active_hours": pa.array(active.astype(np.int64)),
                 "n_islands": pa.array(n_islands.astype(np.int64)),
                 "longest": pa.array(longest.astype(np.int64))}
            )

        ds = (
            read_cols(sf_dir, "events", ["ts", "user_id"])
            .map_batches(pairs, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(islands, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"user_id": pa.int64(), "active_hours": pa.int64(),
             "n_islands": pa.int64(), "longest": pa.int64()},
        )

    sql = """
    WITH eh AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 1000000 // 3600 AS hour
        FROM events
    ),
    isl AS (
        SELECT user_id, hour,
               hour - row_number() OVER (PARTITION BY user_id
                                         ORDER BY hour) AS island
        FROM eh
    ),
    r AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS isl_len
        FROM isl GROUP BY user_id, island
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(isl_len) AS BIGINT) AS active_hours,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(isl_len) AS BIGINT) AS longest
    FROM r GROUP BY user_id
    """
    return q, sql


# --------------------------------------------------------- lineitem_q6_revenue
def _q6_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"n": pa.array([], type=pa.int64()),
                 "rev": pa.array([], type=pa.int64())}
            )
            if "l_quantity" not in t.column_names:
                return empty
            qty = t.column("l_quantity").to_numpy(
                zero_copy_only=False
            )
            disc = np.round(
                t.column("l_discount").to_numpy(zero_copy_only=False)
                * 10000.0
            ).astype(np.int64)  # basis points, exact
            price = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)  # cents, exact
            ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            year_lo = np.datetime64("1996-01-01").astype(
                "datetime64[us]"
            ).astype(np.int64)
            year_hi = np.datetime64("1997-01-01").astype(
                "datetime64[us]"
            ).astype(np.int64)
            keep = ((qty < 24)
                    & (disc >= 500) & (disc <= 700)
                    & (ship >= year_lo) & (ship < year_hi))
            rev = price[keep] * disc[keep]
            return pa.table(
                {"n": pa.array([int(keep.sum())], type=pa.int64()),
                 "rev": pa.array([int(rev.sum())], type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            return pa.table(
                {"n": pa.array(
                    [int(t.column("n").to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64()),
                 "rev": pa.array(
                     [int(t.column("rev").to_numpy(
                         zero_copy_only=False).sum())],
                     type=pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_quantity", "l_discount",
                         "l_extendedprice", "l_shipdate"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        n = int(a.column("n")[0].as_py())
        rev = int(a.column("rev")[0].as_py())
        return pa.table(
            {"n_items": pa.array([n], type=pa.int64()),
             "rev_units": pa.array([rev], type=pa.int64()),
             "revenue": pa.array(
                 [float(np.float64(rev) / 1_000_000.0)],
                 type=pa.float64())}
        )

    sql = """
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(COALESCE(sum(CAST(round_even(l_extendedprice * 100,
                                         0) AS BIGINT)
                    * CAST(round_even(l_discount * 10000, 0)
                           AS BIGINT)), 0) AS BIGINT) AS rev_units,
           CAST(COALESCE(sum(CAST(round_even(l_extendedprice * 100,
                                         0) AS BIGINT)
                    * CAST(round_even(l_discount * 10000, 0)
                           AS BIGINT)), 0) AS DOUBLE) / 1000000.0
               AS revenue
    FROM lineitem
    WHERE l_quantity < 24
      AND CAST(round_even(l_discount * 10000, 0) AS BIGINT)
          BETWEEN 500 AND 700
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    """
    return q, sql


# -------------------------------------------------------- events_rfm_segments
def _rfm_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.quantile import exact_order_stats
        from ..stages.source_rollup import tree_reduce_tables

        def user_partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "last_ts": pa.array([], type=pa.int64()),
                 "freq": pa.array([], type=pa.int64()),
                 "cents": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            tab = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "ts": t.column("ts").cast(pa.int64()),
                 "cents": pa.array(cents)}
            )
            g = tab.group_by("user_id").aggregate(
                [("ts", "max"), ("ts", "count"), ("cents", "sum")]
            )
            return pa.table(
                {"user_id": g.column("user_id"),
                 "last_ts": g.column("ts_max").cast(pa.int64()),
                 "freq": g.column("ts_count").cast(pa.int64()),
                 "cents": g.column("cents_sum").cast(pa.int64())}
            )

        def read_users():
            def merge_bucket(g: pa.Table) -> pa.Table:
                a = g.group_by("user_id").aggregate(
                    [("last_ts", "max"), ("freq", "sum"),
                     ("cents", "sum")]
                )
                return pa.table(
                    {"user_id": a.column("user_id"),
                     "last_ts": a.column("last_ts_max").cast(
                         pa.int64()),
                     "freq": a.column("freq_sum").cast(pa.int64()),
                     "cents": a.column("cents_sum").cast(
                         pa.int64())}
                )

            return (
                read_cols(sf_dir, "events", ["user_id", "ts", "value"])
                .map_batches(user_partial, batch_format="pyarrow")
                .map_batches(_add_user_bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(merge_bucket, batch_format="pyarrow")
            )

        # the per-user table is the small derived artifact (one row per
        # user, orders of magnitude below the event log): materialize
        # it once in the object store and stream the order-stat /
        # assignment passes from there instead of re-aggregating events
        # per pass
        users_ds = read_users().materialize()
        n_users = users_ds.count()

        def keys_of(col):
            def make():
                def proj(t: pa.Table) -> pa.Table:
                    if col not in t.column_names:
                        return pa.table(
                            {"key": pa.array([], type=pa.int64())}
                        )
                    return pa.table({"key": t.column(col)})

                return users_ds.map_batches(
                    proj, batch_format="pyarrow"
                )

            return make

        # tercile boundaries by nearest rank (1-based ceil(k*n/3)),
        # 0-based -1
        ranks = sorted(
            {-(-k * n_users // 3) - 1 for k in (1, 2)}
        )
        bounds = {}
        for col in ("last_ts", "freq", "cents"):
            st = exact_order_stats(keys_of(col), ranks)
            bounds[col] = [
                st[-(-1 * n_users // 3) - 1],
                st[-(-2 * n_users // 3) - 1],
            ]

        b = bounds

        def assign(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names:
                return pa.table(
                    {"segment": pa.array([], type=pa.int64()),
                     "n_users": pa.array([], type=pa.int64())}
                )

            def terc(x, lohi):
                return np.where(
                    x <= lohi[0], 0, np.where(x <= lohi[1], 1, 2)
                ).astype(np.int64)

            r = terc(t.column("last_ts").to_numpy(
                zero_copy_only=False), b["last_ts"])
            f = terc(t.column("freq").to_numpy(
                zero_copy_only=False), b["freq"])
            m = terc(t.column("cents").to_numpy(
                zero_copy_only=False), b["cents"])
            seg = r * 9 + f * 3 + m
            us, uc = np.unique(seg, return_counts=True)
            return pa.table(
                {"segment": pa.array(us),
                 "n_users": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("segment").aggregate([("n_users", "sum")])
            return pa.table(
                {"segment": g.column("segment"),
                 "n_users": g.column("n_users_sum").cast(pa.int64())}
            )

        refs = list(
            users_ds.map_batches(assign, batch_format="pyarrow")
            .to_arrow_refs()
        )
        out = tree_reduce_tables(refs, merge)
        return pa.table(
            {"segment": out.column("segment").cast(pa.int64()),
             "n_users": out.column("n_users").cast(pa.int64())}
        )

    sql = """
    WITH u AS (
        SELECT user_id,
               CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(round_even(value * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY user_id
    ),
    n AS (SELECT count(*) AS n FROM u),
    b AS (
        SELECT
            (SELECT last_ts FROM (
                SELECT last_ts, row_number() OVER (ORDER BY last_ts)
                    AS rk FROM u)
             WHERE rk = CAST(ceil(1 * n.n / 3.0) AS BIGINT)) AS r1,
            (SELECT last_ts FROM (
                SELECT last_ts, row_number() OVER (ORDER BY last_ts)
                    AS rk FROM u)
             WHERE rk = CAST(ceil(2 * n.n / 3.0) AS BIGINT)) AS r2,
            (SELECT freq FROM (
                SELECT freq, row_number() OVER (ORDER BY freq) AS rk
                FROM u)
             WHERE rk = CAST(ceil(1 * n.n / 3.0) AS BIGINT)) AS f1,
            (SELECT freq FROM (
                SELECT freq, row_number() OVER (ORDER BY freq) AS rk
                FROM u)
             WHERE rk = CAST(ceil(2 * n.n / 3.0) AS BIGINT)) AS f2,
            (SELECT cents FROM (
                SELECT cents, row_number() OVER (ORDER BY cents)
                    AS rk FROM u)
             WHERE rk = CAST(ceil(1 * n.n / 3.0) AS BIGINT)) AS m1,
            (SELECT cents FROM (
                SELECT cents, row_number() OVER (ORDER BY cents)
                    AS rk FROM u)
             WHERE rk = CAST(ceil(2 * n.n / 3.0) AS BIGINT)) AS m2
        FROM n
    )
    SELECT CAST(
               (CASE WHEN u.last_ts <= b.r1 THEN 0
                     WHEN u.last_ts <= b.r2 THEN 1 ELSE 2 END) * 9
             + (CASE WHEN u.freq <= b.f1 THEN 0
                     WHEN u.freq <= b.f2 THEN 1 ELSE 2 END) * 3
             + (CASE WHEN u.cents <= b.m1 THEN 0
                     WHEN u.cents <= b.m2 THEN 1 ELSE 2 END)
               AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS n_users
    FROM u, b GROUP BY 1
    """
    return q, sql


def build_wave35_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_longest_run",) + _longest_run_query()))
    add(*(("events_activity_islands",) + _activity_islands_query()))
    add(*(("lineitem_q6_revenue",) + _q6_query()))
    add(*(("events_rfm_segments",) + _rfm_query()))
    return queries, oracles
