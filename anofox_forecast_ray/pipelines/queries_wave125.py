"""Wave-125 queries: TPC-H Q3 and Q10 join shapes.

- orders_q3_topk: TPC-H Q3 (shipping-priority top-k). Customer keys
  in the BUILDING segment are broadcast once as a dense bool bitmap
  (1 bit-ish per customer; ~15 MB at sf1000 — a legitimate
  broadcast). Orders filtered by date + segment bitmap and lineitem
  rows filtered by shipdate collapse to (okey, ...) rows that meet
  in ONE okey-bucketed groupby; revenue is exact integer units
  cents x (10000 - discount_bp). Because an order's lineitems land
  in exactly one bucket, each bucket emits a complete per-order
  revenue and a LOCAL top-10; the tree reduce keeps the global
  top-10 with the same (rev desc, odate asc, okey asc) total order —
  only 10 rows per task ever reach the driver.
- orders_q10_returns: TPC-H Q10 (returned-item customer revenue).
  lineitem keeps only l_returnflag = 'R' rows as integer revenue
  units; orders keeps a one-quarter window as (okey, ckey). One
  okey-bucketed join emits per-customer partial sums (a customer's
  orders span buckets, so inner merges ONLY group-sum — the top-20
  selection happens once, after the full tree reduce). Customer
  attributes (name, acctbal cents, nation name) are joined on the
  driver against the 20 survivors from a broadcast-read customer
  table. Deterministic selection: integer revenue, custkey tiebreak.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-15"
Q3_TOPK = 10
Q10_LO = "1998-01-01"
Q10_HI = "1998-04-01"
Q10_TOPK = 20


def _date_us(s: str) -> int:
    return int(np.datetime64(s).astype("datetime64[us]").astype(np.int64))


# ---------------------------------------------------------- orders_q3_topk
def _q3_query(segment: str = Q3_SEGMENT, cutoff: str = Q3_CUTOFF,
              k: int = Q3_TOPK):
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_wave57 import _okey_bucket

        cut_us = _date_us(cutoff)

        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"]).to_pandas()
        seg = cust[cust["c_mktsegment"] == segment]
        bitmap = np.zeros(int(cust["c_custkey"].max()) + 1,
                          dtype=bool)
        bitmap[seg["c_custkey"].to_numpy(np.int64)] = True
        b_ref = ray.put(bitmap)

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "odate": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            bm = ray.get(b_ref)
            okey = t.column("o_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            odate = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = (odate < cut_us) & bm[ckey]
            n = int(keep.sum())
            return pa.table({
                "okey": pa.array(okey[keep]),
                "odate": pa.array(odate[keep]),
                "val": pa.array(np.zeros(n, dtype=np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def line_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "odate": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            okey = t.column("l_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = ship > cut_us
            okey = okey[keep]
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False)[keep] * 10000.0
            ).astype(np.int64)
            return pa.table({
                "okey": pa.array(okey),
                "odate": pa.array(np.zeros(len(okey),
                                           dtype=np.int64)),
                "val": pa.array(cents * (10000 - bp)),
                "kind": pa.array(np.ones(len(okey),
                                         dtype=np.int8),
                                 type=pa.int8()),
            })

        def topk(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(
                ["rev_units", "odate_neg", "okey"],
                ascending=[False, False, True]).head(k)
            return df.reset_index(drop=True)

        def bucket_join(g: pa.Table) -> pa.Table:
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            od_t = g.filter(pa.array(kind == 0))
            li_t = g.filter(pa.array(kind == 1))
            lk = li_t.column("okey").to_numpy(zero_copy_only=False)
            lv = li_t.column("val").to_numpy(zero_copy_only=False)
            ok = od_t.column("okey").to_numpy(zero_copy_only=False)
            odate = od_t.column("odate").to_numpy(
                zero_copy_only=False)
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "odate_neg": pa.array([], type=pa.int64()),
                "rev_units": pa.array([], type=pa.int64()),
            })
            if lk.size == 0 or ok.size == 0:
                return empty
            order = np.argsort(lk, kind="stable")
            lk_s, lv_s = lk[order], lv[order]
            starts = np.flatnonzero(
                np.r_[True, lk_s[1:] != lk_s[:-1]]
            )
            uk = lk_s[starts]
            urev = np.add.reduceat(lv_s, starts)
            idx = np.clip(np.searchsorted(uk, ok), 0, uk.size - 1)
            hit = uk[idx] == ok
            if not hit.any():
                return empty
            okey_m = ok[hit]
            odate_neg = -odate[hit]
            rev_m = urev[idx[hit]]
            # (rev desc, odate_neg desc, okey asc) == pandas topk()
            sel = np.lexsort((okey_m, -odate_neg, -rev_m))[:k]
            return pa.table({
                "okey": pa.array(okey_m[sel], type=pa.int64()),
                "odate_neg": pa.array(odate_neg[sel],
                                      type=pa.int64()),
                "rev_units": pa.array(rev_m[sel], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df.sort_values(
                ["rev_units", "odate_neg", "okey"],
                ascending=[False, False, True]).head(k)
            return pa.Table.from_pandas(
                df.reset_index(drop=True),
                preserve_index=False).select(
                ["okey", "odate_neg", "rev_units"])

        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(orders_prep, batch_format="pyarrow")
        line = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_shipdate",
                     "l_extendedprice", "l_discount"]).map_batches(line_prep, batch_format="pyarrow")
        refs = list(
            orders.union(line)
            .map_batches(_okey_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
            .to_arrow_refs()
        )
        fin = tree_reduce_tables(refs, merge).to_pandas()
        return pa.table({
            "l_orderkey": pa.array(
                fin["okey"].to_numpy(np.int64)),
            "odate_us": pa.array(
                (-fin["odate_neg"].to_numpy(np.int64))),
            "rev_units": pa.array(
                fin["rev_units"].to_numpy(np.int64)),
        })

    sql = f"""
    SELECT l.l_orderkey AS l_orderkey,
           epoch_us(o.o_orderdate) AS odate_us,
           CAST(sum(CAST(round_even(l.l_extendedprice * 100, 0)
                         AS BIGINT)
                    * (10000 - CAST(round_even(l.l_discount
                                               * 10000, 0)
                               AS BIGINT))) AS BIGINT) AS rev_units
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = '{segment}'
      AND o.o_orderdate < TIMESTAMP '{cutoff}'
      AND l.l_shipdate > TIMESTAMP '{cutoff}'
    GROUP BY 1, 2
    ORDER BY rev_units DESC, odate_us ASC, l_orderkey ASC
    LIMIT {k}
    """
    return q, sql


# ------------------------------------------------------- orders_q10_returns
def _q10_query(lo: str = Q10_LO, hi: str = Q10_HI, k: int = Q10_TOPK):
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_wave57 import _okey_bucket

        lo_us = _date_us(lo)
        hi_us = _date_us(hi)

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "ckey": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            okey = t.column("o_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            odate = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = (odate >= lo_us) & (odate < hi_us)
            n = int(keep.sum())
            return pa.table({
                "okey": pa.array(okey[keep]),
                "ckey": pa.array(ckey[keep]),
                "val": pa.array(np.zeros(n, dtype=np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def line_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "ckey": pa.array([], type=pa.int64()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            flag = t.column("l_returnflag").to_numpy(
                zero_copy_only=False)
            keep = flag == "R"
            okey = t.column("l_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)[keep]
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False)[keep] * 10000.0
            ).astype(np.int64)
            return pa.table({
                "okey": pa.array(okey),
                "ckey": pa.array(np.zeros(len(okey),
                                          dtype=np.int64)),
                "val": pa.array(cents * (10000 - bp)),
                "kind": pa.array(np.ones(len(okey),
                                         dtype=np.int8),
                                 type=pa.int8()),
            })

        def bucket_join(g: pa.Table) -> pa.Table:
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            od_t = g.filter(pa.array(kind == 0))
            li_t = g.filter(pa.array(kind == 1))
            lk = li_t.column("okey").to_numpy(zero_copy_only=False)
            lv = li_t.column("val").to_numpy(zero_copy_only=False)
            ok = od_t.column("okey").to_numpy(zero_copy_only=False)
            ck = od_t.column("ckey").to_numpy(zero_copy_only=False)
            if lk.size == 0 or ok.size == 0:
                return pa.table({
                    "ckey": pa.array([], type=pa.int64()),
                    "rev": pa.array([], type=pa.int64()),
                })
            order = np.argsort(lk, kind="stable")
            lk_s, lv_s = lk[order], lv[order]
            starts = np.flatnonzero(
                np.r_[True, lk_s[1:] != lk_s[:-1]]
            )
            uk = lk_s[starts]
            urev = np.add.reduceat(lv_s, starts)
            idx = np.clip(np.searchsorted(uk, ok), 0, uk.size - 1)
            hit = uk[idx] == ok
            if not hit.any():
                return pa.table({
                    "ckey": pa.array([], type=pa.int64()),
                    "rev": pa.array([], type=pa.int64()),
                })
            ck_m = ck[hit]
            rev_m = urev[idx[hit]]
            o2 = np.argsort(ck_m, kind="stable")
            ck_s, rev_s = ck_m[o2], rev_m[o2]
            pstarts = np.flatnonzero(
                np.r_[True, ck_s[1:] != ck_s[:-1]]
            )
            return pa.table({
                "ckey": pa.array(ck_s[pstarts], type=pa.int64()),
                "rev": pa.array(np.add.reduceat(rev_s, pstarts),
                                type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["ckey"]).aggregate([("rev", "sum")])
            return pa.table({
                "ckey": g.column("ckey").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(orders_prep, batch_format="pyarrow")
        line = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_returnflag",
                     "l_extendedprice", "l_discount"]).map_batches(line_prep, batch_format="pyarrow")
        refs = list(
            orders.union(line)
            .map_batches(_okey_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
            .to_arrow_refs()
        )
        per = tree_reduce_tables(refs, merge).to_pandas()
        per = per.sort_values(["rev", "ckey"],
                              ascending=[False, True]).head(k)

        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal",
                     "c_nationkey"]).to_pandas()
        nat = rd.read_parquet(
            f"{sf_dir}/nation.parquet").to_pandas()
        nat_names = dict(zip(nat["n_nationkey"].astype(int),
                             nat["n_name"]))
        cust = cust.set_index("c_custkey")
        names, bals, nnames = [], [], []
        for ck in per["ckey"].to_numpy(np.int64):
            row = cust.loc[int(ck)]
            names.append(str(row["c_name"]))
            bals.append(int(round(float(row["c_acctbal"])
                                  * 100.0)))
            nnames.append(nat_names[int(row["c_nationkey"])])
        return pa.table({
            "c_custkey": pa.array(
                per["ckey"].to_numpy(np.int64)),
            "c_name": pa.array(names, type=pa.string()),
            "n_name": pa.array(nnames, type=pa.string()),
            "acctbal_cents": pa.array(bals, type=pa.int64()),
            "rev_units": pa.array(
                per["rev"].to_numpy(np.int64)),
        })

    sql = f"""
    SELECT c.c_custkey AS c_custkey,
           c.c_name AS c_name,
           n.n_name AS n_name,
           CAST(round_even(c.c_acctbal * 100, 0) AS BIGINT)
               AS acctbal_cents,
           CAST(sum(CAST(round_even(l.l_extendedprice * 100, 0)
                         AS BIGINT)
                    * (10000 - CAST(round_even(l.l_discount
                                               * 10000, 0)
                               AS BIGINT))) AS BIGINT) AS rev_units
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{lo}'
      AND o.o_orderdate < TIMESTAMP '{hi}'
    GROUP BY 1, 2, 3, 4
    ORDER BY rev_units DESC, c_custkey ASC
    LIMIT {k}
    """
    return q, sql


def build_wave125_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_q3_topk",) + _q3_query()))
    add(*(("orders_q10_returns",) + _q10_query()))
    return queries, oracles
