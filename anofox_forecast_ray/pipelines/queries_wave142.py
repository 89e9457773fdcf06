"""Wave-142 queries: TPC-H Q9 profit shape, Q16 count-distinct shape.

- lineitem_q9_profit: TPC-H Q9 adapted to this corpus (no
  ps_supplycost — the part's retail price stands in as unit cost):
  profit by (supplier nation, order year) =
  sum(extprice_cents * (10000 - disc_bp)
      - qty * retail_cents * 10000), exact integer units on both
  sides. Supplier nations and part retail cents broadcast as dense
  arrays; order years arrive through the okey-bucket join; cells
  are bounded (25 nations x 7 years).
- part_q16_supplier_count: TPC-H Q16 shape — for each
  (brand, size bucket), the number of DISTINCT suppliers that
  shipped such parts, excluding one brand. The distinct
  (brand, bucket, suppkey) triples are deduplicated per block
  BEFORE the shuffle (the grouped COUNT DISTINCT pattern), merged
  by a dedup tree reduce, and only bounded triples move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

Q16_EXCLUDE = "Brand#1"
Q16_SIZE_W = 10


# --------------------------------------------------------- lineitem_q9_profit
def _q9_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_wave57 import _okey_bucket

        nat = rd.read_parquet(
            f"{sf_dir}/nation.parquet").to_pandas()
        nat_names = dict(zip(nat["n_nationkey"].astype(int),
                             nat["n_name"]))
        supp = rd.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        s_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1,
                        dtype=np.int8)
        s_nat[supp["s_suppkey"].to_numpy(np.int64)] = (
            supp["s_nationkey"].to_numpy(np.int8))
        part = rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_retailprice"]).to_pandas()
        p_cents = np.zeros(int(part["p_partkey"].max()) + 1,
                           dtype=np.int64)
        p_cents[part["p_partkey"].to_numpy(np.int64)] = (
            np.round(part["p_retailprice"].to_numpy()
                     * 100.0).astype(np.int64))
        s_ref = ray.put(s_nat)
        p_ref = ray.put(p_cents)

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "year": pa.array([], type=pa.int16()),
                "nat": pa.array([], type=pa.int8()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            okey = t.column("o_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            odate = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            year = (odate.astype("datetime64[us]")
                    .astype("datetime64[Y]").astype(np.int64)
                    + 1970).astype(np.int16)
            n = len(okey)
            return pa.table({
                "okey": pa.array(okey),
                "year": pa.array(year, type=pa.int16()),
                "nat": pa.array(np.zeros(n, dtype=np.int8),
                                type=pa.int8()),
                "val": pa.array(np.zeros(n, dtype=np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def line_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "year": pa.array([], type=pa.int16()),
                "nat": pa.array([], type=pa.int8()),
                "val": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            sn = ray.get(s_ref)
            pc = ray.get(p_ref)
            okey = t.column("l_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            pkey = t.column("l_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            skey = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False) * 10000.0
            ).astype(np.int64)
            profit = (cents * (10000 - bp)
                      - qty * pc[pkey] * 10000)
            return pa.table({
                "okey": pa.array(okey),
                "year": pa.array(
                    np.zeros(len(okey), dtype=np.int16),
                    type=pa.int16()),
                "nat": pa.array(sn[skey], type=pa.int8()),
                "val": pa.array(profit),
                "kind": pa.array(
                    np.ones(len(okey), dtype=np.int8),
                    type=pa.int8()),
            })

        def bucket_join(g: pa.Table) -> pa.Table:
            kind = g.column("kind").to_numpy(zero_copy_only=False)
            od = g.filter(pa.array(kind == 0))
            li = g.filter(pa.array(kind == 1))
            ok = od.column("okey").to_numpy(zero_copy_only=False)
            oyear = od.column("year").to_numpy(zero_copy_only=False)
            lk = li.column("okey").to_numpy(zero_copy_only=False)
            empty = pa.table({
                "nat": pa.array([], type=pa.int8()),
                "year": pa.array([], type=pa.int16()),
                "profit": pa.array([], type=pa.int64()),
            })
            if ok.size == 0 or lk.size == 0:
                return empty
            order = np.argsort(ok, kind="stable")
            ok_s, oy_s = ok[order], oyear[order]
            idx = np.clip(np.searchsorted(ok_s, lk), 0,
                          ok_s.size - 1)
            hit = ok_s[idx] == lk
            if not hit.any():
                return empty
            yr = oy_s[idx[hit]].astype(np.int64)
            nat = li.column("nat").to_numpy(
                zero_copy_only=False)[hit].astype(np.int64)
            val = li.column("val").to_numpy(
                zero_copy_only=False)[hit]
            o2 = np.lexsort((yr, nat))
            n_s, y_s, v_s = nat[o2], yr[o2], val[o2]
            starts = np.flatnonzero(
                np.r_[True, (n_s[1:] != n_s[:-1])
                      | (y_s[1:] != y_s[:-1])]
            )
            return pa.table({
                "nat": pa.array(n_s[starts].astype(np.int8),
                                type=pa.int8()),
                "year": pa.array(y_s[starts].astype(np.int16),
                                 type=pa.int16()),
                "profit": pa.array(np.add.reduceat(v_s, starts),
                                   type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["nat", "year"]).aggregate(
                [("profit", "sum")])
            return pa.table({
                "nat": g.column("nat").cast(pa.int8()),
                "year": g.column("year").cast(pa.int16()),
                "profit": g.column("profit_sum").cast(
                    pa.int64()),
            })

        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(orders_prep, batch_format="pyarrow")
        line = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                     "l_quantity", "l_extendedprice",
                     "l_discount"]).map_batches(line_prep, batch_format="pyarrow")
        refs = list(
            orders.union(line)
            .map_batches(_okey_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        cells["nation"] = [nat_names[int(i)]
                           for i in cells["nat"]]
        cells = cells.sort_values(["nation", "year"]).\
            reset_index(drop=True)
        return pa.table({
            "nation": pa.array(cells["nation"],
                               type=pa.string()),
            "o_year": pa.array(
                cells["year"].to_numpy(np.int16).astype(
                    np.int32), type=pa.int32()),
            "profit_units": pa.array(
                cells["profit"].to_numpy(np.int64)),
        })

    sql = """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(round_even(l.l_extendedprice * 100, 0)
                         AS BIGINT)
                    * (10000 - CAST(round_even(l.l_discount
                                               * 10000, 0)
                               AS BIGINT))
                    - CAST(round_even(l.l_quantity, 0)
                           AS BIGINT)
                      * CAST(round_even(p.p_retailprice * 100,
                                        0) AS BIGINT)
                      * 10000) AS BIGINT) AS profit_units
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
    return q, sql


# ---------------------------------------------------- part_q16_supplier_count
def _q16_query(exclude: str = Q16_EXCLUDE, w: int = Q16_SIZE_W):
    def q(sf_dir: str):
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        part = rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_size"]
        ).to_pandas()
        brands = sorted(part["p_brand"].unique())
        b_idx = {b: i for i, b in enumerate(brands)}
        pb = np.full(int(part["p_partkey"].max()) + 1, -1,
                     dtype=np.int16)
        keep = part["p_brand"] != exclude
        pb[part.loc[keep, "p_partkey"].to_numpy(np.int64)] = [
            b_idx[b] for b in part.loc[keep, "p_brand"]]
        psz = np.zeros(int(part["p_partkey"].max()) + 1,
                       dtype=np.int64)
        psz[part["p_partkey"].to_numpy(np.int64)] = (
            part["p_size"].to_numpy(np.int64))
        b_ref = ray.put(pb)
        s_ref = ray.put(psz)

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "brand": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
                "supp": pa.array([], type=pa.int64()),
            })
            if "l_partkey" not in t.column_names:
                return empty
            bm = ray.get(b_ref)
            sz = ray.get(s_ref)
            pkey = t.column("l_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            skey = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            b = bm[pkey]
            sel = b >= 0
            b = b[sel].astype(np.int64)
            bucket = sz[pkey][sel] // w
            supp = skey[sel]
            key = (b * 64 + bucket) * np.int64(1 << 20) + supp
            uk = np.unique(key)
            return pa.table({
                "brand": pa.array(uk // (64 << 20)),
                "bucket": pa.array((uk >> 20) % 64),
                "supp": pa.array(uk % (1 << 20)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(
                ["brand", "bucket", "supp"]).aggregate([])
            return pa.table({
                "brand": g.column("brand").cast(pa.int64()),
                "bucket": g.column("bucket").cast(pa.int64()),
                "supp": g.column("supp").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        trip = tree_reduce_tables(refs, merge).to_pandas()
        g = trip.groupby(["brand", "bucket"])["supp"].nunique()
        idx = g.index.to_frame(index=False)
        out = pa.table({
            "p_brand": pa.array(
                [brands[int(i)] for i in idx["brand"]],
                type=pa.string()),
            "size_bucket": pa.array(
                idx["bucket"].to_numpy(np.int64)),
            "supplier_cnt": pa.array(
                g.to_numpy(np.int64)),
        })
        return out

    sql = f"""
    SELECT p.p_brand AS p_brand,
           CAST(p.p_size // {w} AS BIGINT) AS size_bucket,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT)
               AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> '{exclude}'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """
    return q, sql


def build_wave142_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_q9_profit",) + _q9_query()))
    add(*(("part_q16_supplier_count",) + _q16_query()))
    return queries, oracles
