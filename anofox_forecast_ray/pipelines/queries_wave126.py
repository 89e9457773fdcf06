"""Wave-126 queries: TPC-H Q8 market share, HyperLogLog sketch.

- lineitem_q8_market_share: TPC-H Q8 (national market share). The
  part-type bitmap, supplier nationkeys and region-filtered customer
  bitmap are broadcast once as dense arrays (bytes per key — the
  legitimate broadcast shape at sf1000). Lineitem rows keep only the
  PROMO parts and carry exact integer revenue units plus a
  target-nation split column; one okey-bucketed groupby joins them
  to the region-filtered orders' year. Everything that leaves a task
  is a (year, tot_units, tgt_units) integer cell; the share is ONE
  f64 division of identical ints on both sides.
- lineitem_hll_distinct: HyperLogLog (m=64 registers) distinct-count
  sketch over exact price cents per returnflag, next to the exact
  distinct count. Per-block partials are bounded: 64 int register
  maxima per flag (mergeable by elementwise max) plus the distinct
  (flag, cents) pairs for the exactness side. Register ranks are
  integers (27 - bit_length of the 26-bit suffix, matching DuckDB's
  length(printf('%b', w))); the harmonic sum folds exact powers of
  two in register order so list_reduce replays it bitwise, and the
  small-range correction m*ln(m/V) is scalar libm on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

Q8_REGION = "ASIA"
Q8_NATION = "NATION_12"  # regionkey 2 ('ASIA') in the synthetic corpus
Q8_PTYPE = "PROMO"
HASH_A = 2654435761
HLL_M = 64
HLL_ALPHA = 0.709


# ------------------------------------------------- lineitem_q8_market_share
def _q8_query(region: str = Q8_REGION, nation: str = Q8_NATION,
              ptype: str = Q8_PTYPE):
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_wave57 import _okey_bucket

        nat = rd.read_parquet(
            f"{sf_dir}/nation.parquet").to_pandas()
        reg = rd.read_parquet(
            f"{sf_dir}/region.parquet").to_pandas()
        rkey = int(reg.loc[reg["r_name"] == region,
                           "r_regionkey"].iloc[0])
        tgt_nkey = int(nat.loc[nat["n_name"] == nation,
                               "n_nationkey"].iloc[0])
        region_nations = set(
            nat.loc[nat["n_regionkey"] == rkey,
                    "n_nationkey"].astype(int))

        part = rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_type"]).to_pandas()
        pbm = np.zeros(int(part["p_partkey"].max()) + 1,
                       dtype=bool)
        pbm[part.loc[part["p_type"] == ptype,
                     "p_partkey"].to_numpy(np.int64)] = True
        supp = rd.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        s_nat = np.full(int(supp["s_suppkey"].max()) + 1, -1,
                        dtype=np.int8)
        s_nat[supp["s_suppkey"].to_numpy(np.int64)] = (
            supp["s_nationkey"].to_numpy(np.int8))
        cust = rd.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"]).to_pandas()
        cbm = np.zeros(int(cust["c_custkey"].max()) + 1,
                       dtype=bool)
        keep_c = cust["c_nationkey"].astype(int).isin(
            region_nations)
        cbm[cust.loc[keep_c, "c_custkey"].to_numpy(
            np.int64)] = True
        p_ref = ray.put(pbm)
        s_ref = ray.put(s_nat)
        c_ref = ray.put(cbm)

        def orders_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "year": pa.array([], type=pa.int16()),
                "val": pa.array([], type=pa.int64()),
                "tval": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            bm = ray.get(c_ref)
            okey = t.column("o_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            odate = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = bm[ckey]
            okey, odate = okey[keep], odate[keep]
            year = (odate.astype("datetime64[us]")
                    .astype("datetime64[Y]").astype(np.int64)
                    + 1970).astype(np.int16)
            n = len(okey)
            return pa.table({
                "okey": pa.array(okey),
                "year": pa.array(year, type=pa.int16()),
                "val": pa.array(np.zeros(n, dtype=np.int64)),
                "tval": pa.array(np.zeros(n, dtype=np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8),
                                 type=pa.int8()),
            })

        def line_prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "okey": pa.array([], type=pa.int64()),
                "year": pa.array([], type=pa.int16()),
                "val": pa.array([], type=pa.int64()),
                "tval": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if "l_orderkey" not in t.column_names:
                return empty
            pm = ray.get(p_ref)
            sn = ray.get(s_ref)
            okey = t.column("l_orderkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            pkey = t.column("l_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            skey = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            keep = pm[pkey]
            okey, skey = okey[keep], skey[keep]
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False)[keep] * 10000.0
            ).astype(np.int64)
            val = cents * (10000 - bp)
            is_t = (sn[skey] == tgt_nkey)
            return pa.table({
                "okey": pa.array(okey),
                "year": pa.array(
                    np.zeros(len(okey), dtype=np.int16),
                    type=pa.int16()),
                "val": pa.array(val),
                "tval": pa.array(np.where(is_t, val, 0)),
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
                "year": pa.array([], type=pa.int16()),
                "tot": pa.array([], type=pa.int64()),
                "tgt": pa.array([], type=pa.int64()),
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
            val = li.column("val").to_numpy(
                zero_copy_only=False)[hit]
            tval = li.column("tval").to_numpy(
                zero_copy_only=False)[hit]
            o2 = np.argsort(yr, kind="stable")
            y_s, v_s, t_s = yr[o2], val[o2], tval[o2]
            starts = np.flatnonzero(
                np.r_[True, y_s[1:] != y_s[:-1]]
            )
            return pa.table({
                "year": pa.array(y_s[starts].astype(np.int16),
                                 type=pa.int16()),
                "tot": pa.array(np.add.reduceat(v_s, starts),
                                type=pa.int64()),
                "tgt": pa.array(np.add.reduceat(t_s, starts),
                                type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["year"]).aggregate(
                [("tot", "sum"), ("tgt", "sum")])
            return pa.table({
                "year": g.column("year").cast(pa.int16()),
                "tot": g.column("tot_sum").cast(pa.int64()),
                "tgt": g.column("tgt_sum").cast(pa.int64()),
            })

        orders = read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(orders_prep, batch_format="pyarrow")
        line = read_cols(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"]).map_batches(line_prep, batch_format="pyarrow")
        refs = list(
            orders.union(line)
            .map_batches(_okey_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(bucket_join, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        cells = cells.sort_values("year").reset_index(drop=True)
        tot = cells["tot"].to_numpy(np.int64)
        tgt = cells["tgt"].to_numpy(np.int64)
        share = tgt.astype(np.float64) / tot.astype(np.float64)
        return pa.table({
            "o_year": pa.array(
                cells["year"].to_numpy(np.int16).astype(
                    np.int32), type=pa.int32()),
            "tot_units": pa.array(tot),
            "tgt_units": pa.array(tgt),
            "mkt_share": pa.array(share, type=pa.float64()),
        })

    sql = f"""
    WITH cells AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(sum(CAST(round_even(l.l_extendedprice * 100,
                                        0) AS BIGINT)
                        * (10000 - CAST(round_even(
                              l.l_discount * 10000, 0)
                              AS BIGINT))) AS BIGINT) AS tot_units,
               CAST(sum(CASE WHEN ns.n_name = '{nation}'
                        THEN CAST(round_even(
                                 l.l_extendedprice * 100, 0)
                             AS BIGINT)
                             * (10000 - CAST(round_even(
                                   l.l_discount * 10000, 0)
                                   AS BIGINT))
                        ELSE 0 END) AS BIGINT) AS tgt_units
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = nc.n_regionkey
        WHERE p.p_type = '{ptype}'
          AND r.r_name = '{region}'
        GROUP BY 1
    )
    SELECT o_year, tot_units, tgt_units,
           CAST(tgt_units AS DOUBLE) / CAST(tot_units AS DOUBLE)
               AS mkt_share
    FROM cells
    ORDER BY o_year
    """
    return q, sql


# --------------------------------------------------- lineitem_hll_distinct
def _hll_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "flag": pa.array([], type=pa.string()),
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "kind": pa.array([], type=pa.int8()),
            })
            if ("l_extendedprice" not in t.column_names
                    or t.num_rows == 0):
                return empty
            flag = np.asarray(
                t.column("l_returnflag").to_pylist(),
                dtype=object)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            out_f, out_a, out_b, out_k = [], [], [], []
            for f in sorted(set(flag.tolist())):
                cs = np.unique(cents[flag == f])
                h = (cs * np.int64(HASH_A)) % np.int64(1 << 32)
                reg = (h % HLL_M).astype(np.int64)
                w = (h // HLL_M).astype(np.int64)
                # rank = 27 - bit_length(w); bit_length(0) == 0
                bl = np.zeros(len(w), dtype=np.int64)
                nz = w > 0
                bl[nz] = (np.floor(np.log2(w[nz].astype(
                    np.float64))).astype(np.int64) + 1)
                rank = 27 - bl
                # per-register max rank (bounded 64 rows)
                mx = np.zeros(HLL_M, dtype=np.int64)
                np.maximum.at(mx, reg, rank)
                for j in range(HLL_M):
                    if mx[j] > 0:
                        out_f.append(f)
                        out_a.append(j)
                        out_b.append(int(mx[j]))
                        out_k.append(0)
                # distinct (flag, cents) pairs for the exact side
                for c in cs.tolist():
                    out_f.append(f)
                    out_a.append(c)
                    out_b.append(0)
                    out_k.append(1)
            return pa.table({
                "flag": pa.array(out_f, type=pa.string()),
                "a": pa.array(out_a, type=pa.int64()),
                "b": pa.array(out_b, type=pa.int64()),
                "kind": pa.array(out_k, type=pa.int8()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            regs = t.filter(pc.equal(t.column("kind"), 0))
            pairs = t.filter(pc.equal(t.column("kind"), 1))
            rg = regs.group_by(["flag", "a"]).aggregate(
                [("b", "max")])
            pg = pairs.group_by(["flag", "a"]).aggregate([])
            rt = pa.table({
                "flag": rg.column("flag").cast(pa.string()),
                "a": rg.column("a").cast(pa.int64()),
                "b": rg.column("b_max").cast(pa.int64()),
                "kind": pa.array(
                    np.zeros(rg.num_rows, dtype=np.int8),
                    type=pa.int8()),
            })
            pt = pa.table({
                "flag": pg.column("flag").cast(pa.string()),
                "a": pg.column("a").cast(pa.int64()),
                "b": pa.array(
                    np.zeros(pg.num_rows, dtype=np.int64)),
                "kind": pa.array(
                    np.ones(pg.num_rows, dtype=np.int8),
                    type=pa.int8()),
            })
            return pa.concat_tables([rt, pt])

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        dd = tree_reduce_tables(refs, merge).to_pandas()

        out = {"flag": [], "n_exact": [], "v_zero": [],
               "z_sum": [], "est": []}
        for f in sorted(dd["flag"].unique()):
            sub = dd[dd["flag"] == f]
            regs = sub[sub["kind"] == 0]
            n_exact = int((sub["kind"] == 1).sum())
            m_arr = np.zeros(HLL_M, dtype=np.int64)
            m_arr[regs["a"].to_numpy(np.int64)] = (
                regs["b"].to_numpy(np.int64))
            v = int((m_arr == 0).sum())
            z = 0.0
            for j in range(HLL_M):
                z = z + 1.0 / float(1 << int(m_arr[j]))
            e_raw = (HLL_ALPHA * float(HLL_M)
                     * float(HLL_M)) / z
            if e_raw <= 2.5 * HLL_M and v > 0:
                est = float(HLL_M) * math.log(
                    float(HLL_M) / float(v))
            else:
                est = e_raw
            out["flag"].append(f)
            out["n_exact"].append(n_exact)
            out["v_zero"].append(v)
            out["z_sum"].append(z)
            out["est"].append(est)
        return pa.table({
            "flag": pa.array(out["flag"], type=pa.string()),
            "n_exact": pa.array(out["n_exact"],
                                type=pa.int64()),
            "v_zero": pa.array(out["v_zero"], type=pa.int64()),
            "z_sum": pa.array(out["z_sum"], type=pa.float64()),
            "est": pa.array(out["est"], type=pa.float64()),
        })

    sql = f"""
    WITH dv AS (
        SELECT DISTINCT l_returnflag AS flag,
               CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) AS cents
        FROM lineitem
    ),
    hv AS (
        SELECT flag, (cents * {HASH_A}) % 4294967296 AS h
        FROM dv
    ),
    rho AS (
        SELECT flag, h % {HLL_M} AS reg,
               max(CASE WHEN h // {HLL_M} = 0 THEN 27
                   ELSE 27 - length(printf('%b', h // {HLL_M}))
                   END) AS m
        FROM hv GROUP BY 1, 2
    ),
    grid AS (
        SELECT f.flag, g.j,
               COALESCE(r.m, 0) AS m
        FROM (SELECT DISTINCT flag FROM dv) f
        CROSS JOIN (SELECT unnest(generate_series(0,
                        {HLL_M - 1})) AS j) g
        LEFT JOIN rho r ON r.flag = f.flag AND r.reg = g.j
    ),
    folds AS (
        SELECT flag,
               CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS v_zero,
               list_reduce(list_prepend(0.0e0,
                   list(1.0e0 / CAST(1 << m AS DOUBLE)
                        ORDER BY j)),
                   (x, y) -> x + y) AS z_sum
        FROM grid GROUP BY flag
    ),
    ex AS (
        SELECT flag, CAST(count(*) AS BIGINT) AS n_exact
        FROM dv GROUP BY flag
    )
    SELECT f.flag AS flag,
           ex.n_exact AS n_exact,
           f.v_zero AS v_zero,
           f.z_sum AS z_sum,
           CASE WHEN ({HLL_ALPHA} * {HLL_M}.0e0 * {HLL_M}.0e0
                      / f.z_sum) <= {2.5 * HLL_M}
                     AND f.v_zero > 0
                THEN {HLL_M}.0e0
                     * ln({HLL_M}.0e0 / CAST(f.v_zero AS DOUBLE))
                ELSE {HLL_ALPHA} * {HLL_M}.0e0 * {HLL_M}.0e0
                     / f.z_sum
           END AS est
    FROM folds f JOIN ex ON ex.flag = f.flag
    ORDER BY f.flag
    """
    return q, sql


def build_wave126_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_q8_market_share",) + _q8_query()))
    add(*(("lineitem_hll_distinct",) + _hll_query()))
    return queries, oracles
