"""Wave-48 queries: brand revenue share, supplier balances by nation,
and DAU/WAU stickiness — closing coverage of the part and supplier
tables.

- brand_revenue_share: lineitem x part big-x-big join by hash-bucket
  co-location on partkey (lineitem pre-aggregates per key per block),
  rolled up to p_brand with each brand's share of total revenue as one
  f64 division of exact cents.
- supplier_nation_balance: supplier joined to the tiny nation dim (a
  driver-read broadcast, never shuffled) — per nation name: supplier
  count and exact acctbal-cents sum/min/max.
- events_dau_wau: product stickiness — per day, distinct active users
  (DAU) and distinct users over the trailing 7 days (WAU), ratio as
  one division. Distinct (day, user) pairs collapse per block, fan out
  to <=7 covering windows, and dedup in one hash-bucket shuffle
  (the sliding-distinct discipline of events_sliding_distinct_24h).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

_MIX = np.uint64(0x9E3779B97F4A7C15)
DAY_US = 86_400_000_000


# ------------------------------------------------------ brand_revenue_share
def _brand_share_query(n_buckets: int = 64):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def li_prep(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "cents": pa.array([], type=pa.int64()),
                 "brand": pa.array([], type=pa.string()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "l_partkey" not in t.column_names:
                return empty
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            g = pa.table(
                {"key": t.column("l_partkey").cast(pa.int64()),
                 "cents": pa.array(cents)}
            ).group_by("key").aggregate([("cents", "sum")])
            kk = g.column("key").to_numpy(zero_copy_only=False)
            return pa.table(
                {"key": g.column("key"),
                 "cents": g.column("cents_sum").cast(pa.int64()),
                 "brand": pa.array([""] * len(kk),
                                   type=pa.string()),
                 "kind": pa.array(np.ones(len(kk), dtype=np.int8),
                                  type=pa.int8()),
                 "bucket": pa.array(
                     (((kk.astype(np.uint64) * _MIX)
                       >> np.uint64(48)).astype(np.int64))
                     % n_buckets)}
            )

        def part_prep(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "cents": pa.array([], type=pa.int64()),
                 "brand": pa.array([], type=pa.string()),
                 "kind": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.int64())}
            )
            if "p_partkey" not in t.column_names:
                return empty
            kk = t.column("p_partkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {"key": pa.array(kk),
                 "cents": pa.array(np.zeros(len(kk),
                                            dtype=np.int64)),
                 "brand": t.column("p_brand"),
                 "kind": pa.array(np.zeros(len(kk), dtype=np.int8),
                                  type=pa.int8()),
                 "bucket": pa.array(
                     (((kk.astype(np.uint64) * _MIX)
                       >> np.uint64(48)).astype(np.int64))
                     % n_buckets)}
            )

        def bucket_join(g: pa.Table) -> pa.Table:
            # per-key revenue via sort+reduceat, sorted lookup onto the
            # parts side (missing keys -> 0), then an Arrow hash
            # aggregate by brand — int64 exact end to end
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            parts = g.filter(pa.array(kind == 0))
            li = g.filter(pa.array(kind == 1))
            lk = li.column("key").to_numpy(zero_copy_only=False)
            lc = li.column("cents").to_numpy(zero_copy_only=False)
            pk = parts.column("key").to_numpy(zero_copy_only=False)
            if pk.size == 0:
                return pa.table(
                    {"brand": pa.array([], type=pa.string()),
                     "cents": pa.array([], type=pa.int64())}
                )
            if lk.size:
                order = np.argsort(lk, kind="stable")
                lk_s, lc_s = lk[order], lc[order]
                starts = np.flatnonzero(
                    np.r_[True, lk_s[1:] != lk_s[:-1]]
                )
                uk = lk_s[starts]
                urev = np.add.reduceat(lc_s, starts)
                idx = np.clip(np.searchsorted(uk, pk), 0,
                              uk.size - 1)
                hit = uk[idx] == pk
                cents = np.where(hit, urev[idx], np.int64(0))
            else:
                cents = np.zeros(pk.size, dtype=np.int64)
            a = pa.table(
                {"brand": parts.column("brand"),
                 "cents": pa.array(cents, type=pa.int64())}
            ).group_by("brand").aggregate([("cents", "sum")])
            return pa.table(
                {"brand": a.column("brand"),
                 "cents": a.column("cents_sum").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("brand").aggregate([("cents", "sum")])
            return pa.table(
                {"brand": g.column("brand"),
                 "cents": g.column("cents_sum").cast(pa.int64())}
            )

        li = read_cols(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"]).map_batches(li_prep, batch_format="pyarrow")
        parts = read_cols(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(part_prep, batch_format="pyarrow")
        refs = list(
            parts.union(li)
            .groupby("bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "brand"
        )
        cents = a["cents"].to_numpy(np.int64)
        total = int(cents.sum())
        return pa.table(
            {"brand": pa.array(a["brand"], type=pa.string()),
             "revenue_cents": pa.array(cents),
             "share": pa.array(
                 cents.astype(np.float64) / np.float64(total),
                 type=pa.float64())}
        )

    sql = """
    WITH b AS (
        SELECT p.p_brand AS brand,
               CAST(COALESCE(sum(CAST(round_even(
                   l.l_extendedprice * 100, 0) AS BIGINT)), 0)
                   AS BIGINT) AS revenue_cents
        FROM part p
        LEFT JOIN lineitem l ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    ),
    t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total FROM b)
    SELECT b.brand, b.revenue_cents,
           CAST(b.revenue_cents AS DOUBLE)
               / CAST(t.total AS DOUBLE) AS share
    FROM b, t
    """
    return q, sql


# -------------------------------------------------- supplier_nation_balance
def _supplier_balance_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        nation = pq.read_table(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name"],
        )
        n2name = dict(
            zip(nation.column("n_nationkey").to_pylist(),
                nation.column("n_name").to_pylist())
        )
        dim_ref = ray.put(n2name)

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"nation": pa.array([], type=pa.string()),
                 "n_suppliers": pa.array([], type=pa.int64()),
                 "sum_bal": pa.array([], type=pa.int64()),
                 "min_bal": pa.array([], type=pa.int64()),
                 "max_bal": pa.array([], type=pa.int64())}
            )
            if "s_suppkey" not in t.column_names:
                return empty
            import ray as _ray

            names = _ray.get(dim_ref)
            nk = t.column("s_nationkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            cents = np.round(
                t.column("s_acctbal").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            g = pa.table(
                {"nation": pa.array(
                    [names[int(k)] for k in nk], type=pa.string()),
                 "bal": pa.array(cents)}
            ).group_by("nation").aggregate(
                [("bal", "count"), ("bal", "sum"), ("bal", "min"),
                 ("bal", "max")]
            )
            return pa.table(
                {"nation": g.column("nation"),
                 "n_suppliers": g.column("bal_count").cast(
                     pa.int64()),
                 "sum_bal": g.column("bal_sum").cast(pa.int64()),
                 "min_bal": g.column("bal_min").cast(pa.int64()),
                 "max_bal": g.column("bal_max").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("nation").aggregate(
                [("n_suppliers", "sum"), ("sum_bal", "sum"),
                 ("min_bal", "min"), ("max_bal", "max")]
            )
            return pa.table(
                {"nation": g.column("nation"),
                 "n_suppliers":
                     g.column("n_suppliers_sum").cast(pa.int64()),
                 "sum_bal": g.column("sum_bal_sum").cast(pa.int64()),
                 "min_bal": g.column("min_bal_min").cast(pa.int64()),
                 "max_bal": g.column("max_bal_max").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        out = tree_reduce_tables(refs, merge)
        return pa.table(
            {"nation": out.column("nation").cast(pa.string()),
             "n_suppliers": out.column("n_suppliers").cast(
                 pa.int64()),
             "sum_bal": out.column("sum_bal").cast(pa.int64()),
             "min_bal": out.column("min_bal").cast(pa.int64()),
             "max_bal": out.column("max_bal").cast(pa.int64())}
        )

    sql = """
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(CAST(round_even(s.s_acctbal * 100, 0)
                         AS BIGINT)) AS BIGINT) AS sum_bal,
           CAST(min(CAST(round_even(s.s_acctbal * 100, 0)
                         AS BIGINT)) AS BIGINT) AS min_bal,
           CAST(max(CAST(round_even(s.s_acctbal * 100, 0)
                         AS BIGINT)) AS BIGINT) AS max_bal
    FROM supplier s JOIN nation n
      ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """
    return q, sql


# ------------------------------------------------------------ events_dau_wau
def _dau_wau_query(window_days: int = 7, n_buckets: int = 256):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        SHIFT = np.int64(40)

        def pairs(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"bucket": pa.array([], type=pa.int64()),
                     "kind": pa.array([], type=pa.int8()),
                     "key": pa.array([], type=pa.int64())}
                )
            day = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // DAY_US)
            user = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            dk = np.unique((day << SHIFT) | user)
            d = dk >> SHIFT
            u = dk & ((np.int64(1) << SHIFT) - 1)
            # DAU keys (window = the day itself) and WAU keys (each
            # distinct (day,user) covers the next window_days windows)
            w = (d[:, None]
                 + np.arange(window_days, dtype=np.int64)[None, :]
                 ).ravel()
            uu = np.repeat(u, window_days)
            wkey = np.unique((w << SHIFT) | uu)
            keys = np.concatenate((dk, wkey))
            kind = np.concatenate(
                (np.zeros(dk.size, dtype=np.int8),
                 np.ones(wkey.size, dtype=np.int8))
            )
            b = (((keys.astype(np.uint64) * _MIX)
                  >> np.uint64(48)).astype(np.int64)) % n_buckets
            return pa.table(
                {"bucket": pa.array(b),
                 "kind": pa.array(kind, type=pa.int8()),
                 "key": pa.array(keys)}
            )

        def bucket_count(g: pa.Table) -> pa.Table:
            kinds = g.column("kind").to_numpy(zero_copy_only=False)
            keys = g.column("key").to_numpy(zero_copy_only=False)
            out = []
            for kind in (0, 1):
                k = np.unique(keys[kinds == kind])
                d = k >> SHIFT
                ud, uc = np.unique(d, return_counts=True)
                for day, c in zip(ud, uc):
                    out.append((int(day), int(kind), int(c)))
            return pa.table(
                {"day": pa.array([r[0] for r in out],
                                 type=pa.int64()),
                 "kind": pa.array([r[1] for r in out],
                                  type=pa.int64()),
                 "cnt": pa.array([r[2] for r in out],
                                 type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["day", "kind"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"day": g.column("day"), "kind": g.column("kind"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id"])
            .map_batches(pairs, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_count, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        dau = a[a["kind"] == 0].set_index("day")["cnt"]
        wau = a[a["kind"] == 1].set_index("day")["cnt"]
        days = sorted(dau.index)
        rows = {"day": [], "dau": [], "wau": [], "stickiness": []}
        for d in days:
            dv, wv = int(dau[d]), int(wau[d])
            rows["day"].append(int(d))
            rows["dau"].append(dv)
            rows["wau"].append(wv)
            rows["stickiness"].append(
                float(np.float64(dv) / np.float64(wv))
            )
        return pa.table(
            {"day": pa.array(rows["day"], type=pa.int64()),
             "dau": pa.array(rows["dau"], type=pa.int64()),
             "wau": pa.array(rows["wau"], type=pa.int64()),
             "stickiness": pa.array(rows["stickiness"],
                                    type=pa.float64())}
        )

    sql = f"""
    WITH du AS (
        SELECT DISTINCT epoch_us(ts) // {DAY_US} AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du
        GROUP BY day
    ),
    wau AS (
        SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT)
            AS wau
        FROM days d JOIN du u
          ON u.day BETWEEN d.day - {window_days - 1} AND d.day
        GROUP BY d.day
    )
    SELECT CAST(a.day AS BIGINT) AS day, a.dau, w.wau,
           CAST(a.dau AS DOUBLE) / CAST(w.wau AS DOUBLE)
               AS stickiness
    FROM dau a JOIN wau w ON w.day = a.day
    """
    return q, sql


def build_wave48_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("brand_revenue_share",) + _brand_share_query()))
    add(*(("supplier_nation_balance",) + _supplier_balance_query()))
    add(*(("events_dau_wau",) + _dau_wau_query()))
    return queries, oracles
