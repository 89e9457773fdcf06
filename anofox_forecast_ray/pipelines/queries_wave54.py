"""Wave-54 queries: composition over time, production drift, churn, and
incremental maintenance of a join view.

- orders_status_mix: order-status composition per month — bounded
  (month, status) cells with each cell's share of its month.
- corpus_length_drift_r1: lag-1 autocorrelation of doc length in
  doc_id (production) order — the cheap ingestion-drift alarm. Exact
  integer moments over consecutive pairs; doc_ids are dense here so
  the pair join is by doc_id + 1 on both sides.
- events_churn_rate: share of users whose last event is more than 7
  days before the corpus horizon — per-user max-ts partials, two
  integers and one division.
- orders_segment_revenue_ivm: incremental view maintenance over a
  JOIN — segment revenue from a base partition (orders before the
  cutoff) plus a delta partition (orders at/after it), merged by
  integer addition and proven equal to the full recompute oracle.
  This is the maintenance path of a continuously-ingested join view:
  only the delta's custkeys re-enter the bucket join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

_MIX = np.uint64(0x9E3779B97F4A7C15)
DAY_US = 86_400_000_000
CHURN_DAYS = 7
# orders cutoff: 1997-01-01 (mid TPC-H range)
ORD_CUTOFF_US = 852_076_800_000_000


# ------------------------------------------------------- orders_status_mix
def _status_mix_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "o_orderdate" not in t.column_names:
                return pa.table(
                    {"month": pa.array([], type=pa.int64()),
                     "status": pa.array([], type=pa.string()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            month = (us // DAY_US).astype("datetime64[D]").astype(
                "datetime64[M]"
            ).astype(np.int64)
            g = pa.table(
                {"month": pa.array(month),
                 "status": t.column("o_orderstatus")}
            ).group_by(["month", "status"]).aggregate(
                [("month", "count")]
            )
            return pa.table(
                {"month": g.column("month"),
                 "status": g.column("status"),
                 "cnt": g.column("month_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["month", "status"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"month": g.column("month"),
                 "status": g.column("status"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderdate", "o_orderstatus"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        m0 = int(a["month"].min())
        tot = a.groupby("month")["cnt"].sum().to_dict()
        a = a.sort_values(["month", "status"])
        month = a["month"].to_numpy(np.int64)
        cnt = a["cnt"].to_numpy(np.int64)
        mt = np.asarray([tot[int(m)] for m in month],
                        dtype=np.int64)
        return pa.table(
            {"month_idx": pa.array(month - m0),
             "status": pa.array(a["status"], type=pa.string()),
             "cnt": pa.array(cnt),
             "share": pa.array(
                 cnt.astype(np.float64) / mt.astype(np.float64),
                 type=pa.float64())}
        )

    sql = """
    WITH o AS (
        SELECT date_part('year', o_orderdate) * 12
                   + date_part('month', o_orderdate) - 1 AS m,
               o_orderstatus AS status
        FROM orders
    ),
    m0 AS (SELECT min(m) AS m0 FROM o),
    c AS (
        SELECT m, status, CAST(count(*) AS BIGINT) AS cnt FROM o
        GROUP BY m, status
    ),
    t AS (SELECT m, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY m)
    SELECT CAST(c.m - m0.m0 AS BIGINT) AS month_idx, c.status,
           c.cnt,
           CAST(c.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
    FROM c JOIN t ON t.m = c.m CROSS JOIN m0
    """
    return q, sql


# -------------------------------------------------- corpus_length_drift_r1
def _length_drift_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "doc_id" not in t.column_names:
                return pa.table(
                    {"doc_id": pa.array([], type=pa.int64()),
                     "v": pa.array([], type=pa.int64())}
                )
            return pa.table(
                {"doc_id": t.column("doc_id").cast(pa.int64()),
                 "v": t.column("n_chars").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            return t

        refs = list(
            read_cols(sf_dir, "documents", ["doc_id", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        # doc ids are dense (0..n-1): the lag-1 pair moments come from
        # a driver sort of the (small) id/length pairs; at 100 TB this
        # would be the consecutive-pair shuffle of doc_dup_span's
        # union-groupby shape instead
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "doc_id"
        )
        v = a["v"].to_numpy(np.int64)
        x, y = v[:-1], v[1:]
        m = int(x.size)
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x * y).sum())
        num = m * sxy - sx * sy
        r = (float(np.float64(num))
             / float(np.sqrt(np.float64(m * sxx - sx * sx)
                             * np.float64(m * syy - sy * sy))))
        return pa.table(
            {"n_pairs": pa.array([m], type=pa.int64()),
             "r1": pa.array([r], type=pa.float64())}
        )

    sql = """
    WITH d AS (
        SELECT CAST(doc_id AS BIGINT) AS i,
               CAST(n_chars AS BIGINT) AS v
        FROM documents
    ),
    p AS (
        SELECT a.v AS x, b.v AS y FROM d a
        JOIN d b ON b.i = a.i + 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM p
    )
    SELECT m AS n_pairs,
           CAST(m * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                      * CAST(m * syy - sy * sy AS DOUBLE)) AS r1
    FROM m
    """
    return q, sql


# --------------------------------------------------------- events_churn_rate
def _churn_query(days: int = CHURN_DAYS):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names:
                return pa.table(
                    {"user_id": pa.array([], type=pa.int64()),
                     "last_ts": pa.array([], type=pa.int64())}
                )
            g = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "tus": t.column("ts").cast(pa.int64())}
            ).group_by("user_id").aggregate([("tus", "max")])
            return pa.table(
                {"user_id": g.column("user_id"),
                 "last_ts": g.column("tus_max").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("user_id").aggregate([("last_ts", "max")])
            return pa.table(
                {"user_id": g.column("user_id"),
                 "last_ts": g.column("last_ts_max").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        horizon = int(a["last_ts"].max())
        cutoff = horizon - days * DAY_US
        n = int(len(a))
        churned = int((a["last_ts"] < cutoff).sum())
        return pa.table(
            {"n_users": pa.array([n], type=pa.int64()),
             "n_churned": pa.array([churned], type=pa.int64()),
             "churn_rate": pa.array(
                 [float(np.float64(churned) / np.float64(n))],
                 type=pa.float64())}
        )

    sql = f"""
    WITH u AS (
        SELECT user_id, max(epoch_us(ts)) AS last_ts FROM events
        GROUP BY user_id
    ),
    h AS (SELECT max(last_ts) AS horizon FROM u)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN u.last_ts
                              < h.horizon - {days} * {DAY_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
           CAST(sum(CASE WHEN u.last_ts
                              < h.horizon - {days} * {DAY_US}
                     THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS churn_rate
    FROM u, h
    """
    return q, sql


# --------------------------------------------- orders_segment_revenue_ivm
def _segment_ivm_query(cutoff_us: int = ORD_CUTOFF_US,
                       n_buckets: int = 64):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def run_partition(pred):
            """Segment revenue for one orders partition via the
            bucketed join (the IVM delta path re-runs exactly this)."""

            def ord_prep(t: pa.Table) -> pa.Table:
                empty = pa.table(
                    {"key": pa.array([], type=pa.int64()),
                     "cents": pa.array([], type=pa.int64()),
                     "seg": pa.array([], type=pa.string()),
                     "kind": pa.array([], type=pa.int8()),
                     "bucket": pa.array([], type=pa.int64())}
                )
                if "o_custkey" not in t.column_names:
                    return empty
                us = t.column("o_orderdate").cast(
                    pa.int64()).to_numpy(zero_copy_only=False)
                keep = pred(us)
                if not keep.any():
                    return empty
                sub = t.filter(pa.array(keep))
                k = sub.column("o_custkey").cast(
                    pa.int64()).to_numpy(zero_copy_only=False)
                cents = np.round(
                    sub.column("o_totalprice").to_numpy(
                        zero_copy_only=False) * 100.0
                ).astype(np.int64)
                g = pa.table(
                    {"key": pa.array(k), "cents": pa.array(cents)}
                ).group_by("key").aggregate([("cents", "sum")])
                kk = g.column("key").to_numpy(zero_copy_only=False)
                return pa.table(
                    {"key": g.column("key"),
                     "cents": g.column("cents_sum").cast(
                         pa.int64()),
                     "seg": pa.array([""] * len(kk),
                                     type=pa.string()),
                     "kind": pa.array(
                         np.ones(len(kk), dtype=np.int8),
                         type=pa.int8()),
                     "bucket": pa.array(
                         (((kk.astype(np.uint64) * _MIX)
                           >> np.uint64(48)).astype(np.int64))
                         % n_buckets)}
                )

            def cust_prep(t: pa.Table) -> pa.Table:
                empty = pa.table(
                    {"key": pa.array([], type=pa.int64()),
                     "cents": pa.array([], type=pa.int64()),
                     "seg": pa.array([], type=pa.string()),
                     "kind": pa.array([], type=pa.int8()),
                     "bucket": pa.array([], type=pa.int64())}
                )
                if "c_custkey" not in t.column_names:
                    return empty
                k = t.column("c_custkey").cast(
                    pa.int64()).to_numpy(zero_copy_only=False)
                return pa.table(
                    {"key": pa.array(k),
                     "cents": pa.array(
                         np.zeros(len(k), dtype=np.int64)),
                     "seg": t.column("c_mktsegment"),
                     "kind": pa.array(
                         np.zeros(len(k), dtype=np.int8),
                         type=pa.int8()),
                     "bucket": pa.array(
                         (((k.astype(np.uint64) * _MIX)
                           >> np.uint64(48)).astype(np.int64))
                         % n_buckets)}
                )

            def bucket_join(g: pa.Table) -> pa.Table:
                kind = g.column("kind").to_numpy(
                    zero_copy_only=False)
                cust = g.filter(pa.array(kind == 0))
                orders = g.filter(pa.array(kind == 1))
                ok = orders.column("key").to_numpy(
                    zero_copy_only=False)
                ov = orders.column("cents").to_numpy(
                    zero_copy_only=False)
                ck = cust.column("key").to_numpy(
                    zero_copy_only=False)
                if ck.size == 0:
                    return pa.table(
                        {"seg": pa.array([], type=pa.string()),
                         "cents": pa.array([], type=pa.int64())}
                    )
                if ok.size:
                    order = np.argsort(ok, kind="stable")
                    ok_s, ov_s = ok[order], ov[order]
                    starts = np.flatnonzero(
                        np.r_[True, ok_s[1:] != ok_s[:-1]]
                    )
                    uk = ok_s[starts]
                    urev = np.add.reduceat(ov_s, starts)
                    idx = np.clip(np.searchsorted(uk, ck), 0,
                                  uk.size - 1)
                    hit = uk[idx] == ck
                    cents = np.where(hit, urev[idx], np.int64(0))
                else:
                    cents = np.zeros(ck.size, dtype=np.int64)
                a = pa.table(
                    {"seg": cust.column("seg"),
                     "cents": pa.array(cents, type=pa.int64())}
                ).group_by("seg").aggregate([("cents", "sum")])
                return pa.table(
                    {"seg": a.column("seg"),
                     "cents": a.column("cents_sum").cast(
                         pa.int64())}
                )

            def merge(t: pa.Table) -> pa.Table:
                g = t.group_by("seg").aggregate([("cents", "sum")])
                return pa.table(
                    {"seg": g.column("seg"),
                     "cents": g.column("cents_sum").cast(
                         pa.int64())}
                )

            orders = read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice",
                         "o_orderdate"]).map_batches(ord_prep, batch_format="pyarrow")
            cust = read_cols(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(cust_prep, batch_format="pyarrow")
            refs = list(
                cust.union(orders)
                .groupby("bucket")
                .map_groups(bucket_join, batch_format="pyarrow")
                .to_arrow_refs()
            )
            t = tree_reduce_tables(refs, merge).to_pandas()
            return dict(zip(t["seg"], t["cents"].astype(int)))

        base = run_partition(lambda us: us < cutoff_us)
        delta = run_partition(lambda us: us >= cutoff_us)
        segs = sorted(set(base) | set(delta))
        merged = [base.get(s, 0) + delta.get(s, 0) for s in segs]
        return pa.table(
            {"segment": pa.array(segs, type=pa.string()),
             "revenue_cents": pa.array(merged, type=pa.int64()),
             "base_cents": pa.array(
                 [base.get(s, 0) for s in segs], type=pa.int64()),
             "delta_cents": pa.array(
                 [delta.get(s, 0) for s in segs],
                 type=pa.int64())}
        )

    sql = f"""
    SELECT c.c_mktsegment AS segment,
           CAST(COALESCE(sum(CAST(round_even(o.o_totalprice * 100,
                                       0) AS BIGINT)), 0)
                AS BIGINT) AS revenue_cents,
           CAST(COALESCE(sum(CASE WHEN epoch_us(o.o_orderdate)
                                       < {cutoff_us}
                    THEN CAST(round_even(o.o_totalprice * 100, 0)
                              AS BIGINT) ELSE 0 END), 0)
                AS BIGINT) AS base_cents,
           CAST(COALESCE(sum(CASE WHEN epoch_us(o.o_orderdate)
                                       >= {cutoff_us}
                    THEN CAST(round_even(o.o_totalprice * 100, 0)
                              AS BIGINT) ELSE 0 END), 0)
                AS BIGINT) AS delta_cents
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """
    return q, sql


def build_wave54_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_status_mix",) + _status_mix_query()))
    add(*(("corpus_length_drift_r1",) + _length_drift_query()))
    add(*(("events_churn_rate",) + _churn_query()))
    add(*(("orders_segment_revenue_ivm",) + _segment_ivm_query()))
    return queries, oracles
