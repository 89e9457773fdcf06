"""Wave-167 queries: growth accounting, referential-integrity audit.

- events_growth_accounting: the product-analytics growth ledger —
  per day, DAU splits into NEW (first-ever day), RETAINED (active
  yesterday) and RESURRECTED (active before, not yesterday), and
  CHURNED counts users active yesterday but not today; the ledger
  identity DAU_t - DAU_{t-1} = new + resurrected - churned holds
  exactly and is asserted in the brute. Per-user day sets reduce
  inside the user bucket; only bounded (day, class) cells move.
- lineitem_orphan_audit: the referential-integrity / coverage
  audit over the whole star schema — orphan foreign keys in
  lineitem and orders (broadcast key bitmaps, per-block counts)
  plus reverse coverage: parts never shipped, suppliers never
  used, customers who never ordered. All integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


# ------------------------------------------------- events_growth_accounting
def _growth_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "user_id": t.column("user_id"),
                "day": pa.array(
                    (tus // US_PER_DAY).astype(np.int64)),
            })

        def classify(g: pd.DataFrame) -> pa.Table:
            import collections
            cells = collections.Counter()
            for _u, grp in g.groupby("user_id", sort=False):
                days = sorted(set(
                    int(d) for d in grp["day"]))
                first = days[0]
                dset = set(days)
                for d in days:
                    if d == first:
                        cls = 0  # new
                    elif d - 1 in dset:
                        cls = 1  # retained
                    else:
                        cls = 2  # resurrected
                    cells[(d, cls)] += 1
                    if d + 1 not in dset:
                        cells[(d + 1, 3)] += 1  # churn at d+1
            keys = sorted(cells)
            return pa.table({
                "day": pa.array([k[0] for k in keys],
                                type=pa.int64()),
                "cls": pa.array([k[1] for k in keys],
                                type=pa.int64()),
                "c": pa.array([cells[k] for k in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["day", "cls"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "cls": g.column("cls").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket,
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(classify, batch_format="pandas")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        tab = {}
        for _, r in cells.iterrows():
            tab[(int(r["day"]), int(r["cls"]))] = int(r["c"])
        days = sorted(set(d for d, cls in tab
                          if cls in (0, 1, 2)))
        dmax = max(days)

        out = {"day": [], "dau": [], "new": [],
               "retained": [], "resurrected": [],
               "churned": []}
        for d in days:
            nw = tab.get((d, 0), 0)
            rt = tab.get((d, 1), 0)
            rs = tab.get((d, 2), 0)
            ch = tab.get((d, 3), 0)
            out["day"].append(d)
            out["dau"].append(nw + rt + rs)
            out["new"].append(nw)
            out["retained"].append(rt)
            out["resurrected"].append(rs)
            out["churned"].append(ch)
        return pa.table({
            "day": pa.array(out["day"], type=pa.int64()),
            "dau": pa.array(out["dau"], type=pa.int64()),
            "new_u": pa.array(out["new"], type=pa.int64()),
            "retained": pa.array(out["retained"],
                                 type=pa.int64()),
            "resurrected": pa.array(out["resurrected"],
                                    type=pa.int64()),
            "churned": pa.array(out["churned"],
                                type=pa.int64()),
        })

    sql = f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {US_PER_DAY} AS day
        FROM events
    ),
    fd AS (
        SELECT user_id, min(day) AS first FROM ud
        GROUP BY user_id
    ),
    cls AS (
        SELECT ud.day,
               CASE WHEN ud.day = fd.first THEN 0
                    WHEN EXISTS (SELECT 1 FROM ud p
                        WHERE p.user_id = ud.user_id
                          AND p.day = ud.day - 1) THEN 1
                    ELSE 2 END AS cls
        FROM ud JOIN fd ON fd.user_id = ud.user_id
    ),
    churn AS (
        SELECT ud.day + 1 AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM ud
        WHERE NOT EXISTS (SELECT 1 FROM ud n
            WHERE n.user_id = ud.user_id
              AND n.day = ud.day + 1)
        GROUP BY ud.day + 1
    ),
    per AS (
        SELECT day,
               CAST(count(*) AS BIGINT) AS dau,
               CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS new_u,
               CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS retained,
               CAST(sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS resurrected
        FROM cls GROUP BY day
    )
    SELECT per.day AS day,
           per.dau AS dau,
           per.new_u AS new_u,
           per.retained AS retained,
           per.resurrected AS resurrected,
           COALESCE(churn.c, 0) AS churned
    FROM per LEFT JOIN churn ON churn.day = per.day
    ORDER BY per.day
    """
    return q, sql


# --------------------------------------------------- lineitem_orphan_audit
def _orphan_query():
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def keyset(table, col):
            import ray.data as rd2

            df = rd2.read_parquet(
                f"{sf_dir}/{table}.parquet",
                columns=[col]).to_pandas()
            mx = int(df[col].max())
            bm = np.zeros(mx + 2, dtype=bool)
            bm[df[col].to_numpy(np.int64)] = True
            return bm

        o_bm = keyset("orders", "o_orderkey")
        p_bm = keyset("part", "p_partkey")
        s_bm = keyset("supplier", "s_suppkey")
        c_bm = keyset("customer", "c_custkey")
        refs_bm = ray.put((o_bm, p_bm, s_bm, c_bm))

        def li_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "o_orph": pa.array([], type=pa.int64()),
                "p_orph": pa.array([], type=pa.int64()),
                "s_orph": pa.array([], type=pa.int64()),
                "pk": pa.array([], type=pa.int64()),
                "sk": pa.array([], type=pa.int64()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            ob, pb, sb, _cb = ray.get(refs_bm)
            ok = t.column("l_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            pk = t.column("l_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            sk = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)

            def orph(keys, bm):
                inb = keys < len(bm)
                bad = (~inb).sum()
                bad += (~bm[np.where(inb, keys, 0)]
                        & inb).sum()
                return int(bad)

            up = np.unique(pk)
            us = np.unique(sk)
            n = max(len(up), len(us), 1)
            return pa.table({
                "o_orph": pa.array(
                    np.pad(np.array([orph(ok, ob)],
                                    dtype=np.int64),
                           (0, n - 1))),
                "p_orph": pa.array(
                    np.pad(np.array([orph(pk, pb)],
                                    dtype=np.int64),
                           (0, n - 1))),
                "s_orph": pa.array(
                    np.pad(np.array([orph(sk, sb)],
                                    dtype=np.int64),
                           (0, n - 1))),
                "pk": pa.array(np.pad(
                    up, (0, n - len(up)),
                    constant_values=-1)),
                "sk": pa.array(np.pad(
                    us, (0, n - len(us)),
                    constant_values=-1)),
            })

        # NOTE: pk/sk columns carry per-block distinct keys for the
        # reverse-coverage side; lengths are padded/truncated to
        # match, with -1 as filler (never a real key).
        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            pk = np.unique(t.column("pk").to_numpy(
                zero_copy_only=False))
            sk = np.unique(t.column("sk").to_numpy(
                zero_copy_only=False))
            pk = pk[pk >= 0]
            sk = sk[sk >= 0]
            n = max(len(pk), len(sk), 1)

            def cnt_col(name):
                v = pc.sum(t.column(name)).as_py() or 0
                a = np.zeros(n, dtype=np.int64)
                a[0] = int(v)
                return pa.array(a)

            return pa.table({
                "o_orph": cnt_col("o_orph"),
                "p_orph": cnt_col("p_orph"),
                "s_orph": cnt_col("s_orph"),
                "pk": pa.array(np.pad(
                    pk, (0, n - len(pk)),
                    constant_values=-1)),
                "sk": pa.array(np.pad(
                    sk, (0, n - len(sk)),
                    constant_values=-1)),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_orderkey", "l_partkey",
                         "l_suppkey"])
            .map_batches(li_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        used_p = set(int(v) for v in a["pk"] if int(v) >= 0)
        used_s = set(int(v) for v in a["sk"] if int(v) >= 0)
        o_orph = int(a["o_orph"].iloc[0])
        p_orph = int(a["p_orph"].iloc[0])
        s_orph = int(a["s_orph"].iloc[0])

        import ray.data as rd2
        pt = rd2.read_parquet(f"{sf_dir}/part.parquet",
                              columns=["p_partkey"]
                              ).to_pandas()
        su = rd2.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey"]
                              ).to_pandas()
        od = rd2.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey"]
                              ).to_pandas()
        cu = rd2.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"]
                              ).to_pandas()
        unsold = int((~pt["p_partkey"].isin(used_p)).sum())
        unused = int((~su["s_suppkey"].isin(used_s)).sum())
        no_orders = int((~cu["c_custkey"].isin(
            set(od["o_custkey"].astype(int)))).sum())
        return pa.table({
            "li_order_orphans": pa.array([o_orph],
                                         type=pa.int64()),
            "li_part_orphans": pa.array([p_orph],
                                        type=pa.int64()),
            "li_supp_orphans": pa.array([s_orph],
                                        type=pa.int64()),
            "parts_never_sold": pa.array([unsold],
                                         type=pa.int64()),
            "suppliers_unused": pa.array([unused],
                                         type=pa.int64()),
            "customers_no_orders": pa.array([no_orders],
                                            type=pa.int64()),
            "parts_sold": pa.array(
                [len(pt) - unsold], type=pa.int64()),
            "suppliers_used": pa.array(
                [len(su) - unused], type=pa.int64()),
            "customers_active": pa.array(
                [len(cu) - no_orders], type=pa.int64()),
        })

    sql = """
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
             WHERE o.o_orderkey = l.l_orderkey))
            AS li_order_orphans,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p
             WHERE p.p_partkey = l.l_partkey))
            AS li_part_orphans,
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM supplier s
             WHERE s.s_suppkey = l.l_suppkey))
            AS li_supp_orphans,
        (SELECT CAST(count(*) AS BIGINT) FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_partkey = p.p_partkey))
            AS parts_never_sold,
        (SELECT CAST(count(*) AS BIGINT) FROM supplier s
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_suppkey = s.s_suppkey))
            AS suppliers_unused,
        (SELECT CAST(count(*) AS BIGINT) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey))
            AS customers_no_orders,
        (SELECT CAST(count(*) AS BIGINT) FROM part p
         WHERE EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_partkey = p.p_partkey))
            AS parts_sold,
        (SELECT CAST(count(*) AS BIGINT) FROM supplier s
         WHERE EXISTS (SELECT 1 FROM lineitem l
             WHERE l.l_suppkey = s.s_suppkey))
            AS suppliers_used,
        (SELECT CAST(count(*) AS BIGINT) FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey))
            AS customers_active
    """
    return q, sql


def build_wave167_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_growth_accounting",) + _growth_query()))
    add(*(("lineitem_orphan_audit",) + _orphan_query()))
    return queries, oracles
