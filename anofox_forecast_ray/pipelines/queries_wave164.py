"""Wave-164 queries: discounted CLV, supplier concentration.

- customer_clv_discounted: simple discounted customer lifetime
  value — per customer, sum over order months of
  (month revenue cents) * delta^(months since the customer's first
  order), delta = 0.99. The per-customer fold walks months in
  ascending order carrying delta^k in the accumulator (one
  multiply per month, no pow drift), and the result is the top-10
  CLV customers with (clv desc, custkey) tie-break.
- supplier_concentration: industrial-organization concentration of
  supplier revenue within each nation — CR4 (top-4 revenue share)
  and HHI (sum of squared shares, in the conventional 0-10000
  points). Revenue is exact integer units; shares are one division
  each; the HHI fold walks suppliers in revenue-desc/key order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

CLV_DELTA = 0.99
CLV_K = 10


# -------------------------------------------------- customer_clv_discounted
def _clv_query(delta: float = CLV_DELTA, k: int = CLV_K):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "ckey": pa.array([], type=pa.int64()),
                "month": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "o_custkey" not in t.column_names:
                return empty
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            od = t.column("o_orderdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (od.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            key = ckey * np.int64(1 << 16) + month
            uk, inv = np.unique(key, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "ckey": pa.array(uk // (1 << 16)),
                "month": pa.array(uk % (1 << 16)),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["ckey", "month"]).aggregate(
                [("cents", "sum")])
            return pa.table({
                "ckey": g.column("ckey").cast(pa.int64()),
                "month": g.column("month").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(
                    pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate",
                         "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        prof = tree_reduce_tables(refs, merge).to_pandas()

        scored = []
        for ck, g in prof.groupby("ckey"):
            g = g.sort_values("month")
            m0 = int(g["month"].iloc[0])
            import math
            clv = 0.0
            w = 1.0
            prev = m0
            for mo, c in zip(g["month"], g["cents"]):
                mo = int(mo)
                # pow(delta, gap), matching the oracle's power()
                w = w * math.pow(delta, float(mo - prev))
                prev = mo
                clv = clv + w * float(int(c))
            scored.append((clv, int(ck)))
        scored.sort(key=lambda r: (-r[0], r[1]))
        top = scored[:k]
        return pa.table({
            "c_custkey": pa.array([r[1] for r in top],
                                  type=pa.int64()),
            "clv_cents": pa.array([r[0] for r in top],
                                  type=pa.float64()),
        })

    sql = f"""
    WITH o AS (
        SELECT o_custkey AS ckey,
               year(o_orderdate) * 12 + month(o_orderdate)
                   AS month,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    base AS (
        SELECT ckey, min(month) AS m0 FROM o GROUP BY ckey
    ),
    clv AS (
        SELECT o.ckey,
               list_reduce(
                   list_prepend([1.0e0, 0.0e0, -1.0e0],
                       list([CAST(o.month - base.m0
                                  AS DOUBLE),
                             CAST(o.cents AS DOUBLE), 0.0e0]
                            ORDER BY o.month)),
                   (acc, e) -> [
                       acc[1] * power({delta!r},
                           e[1] - CASE WHEN acc[3] < 0.0e0
                                  THEN 0.0e0 ELSE acc[3]
                                  END),
                       acc[2] + acc[1]
                           * power({delta!r},
                               e[1] - CASE WHEN acc[3]
                                      < 0.0e0 THEN 0.0e0
                                      ELSE acc[3] END)
                           * e[2],
                       e[1]])[2] AS v
        FROM o JOIN base ON base.ckey = o.ckey
        GROUP BY o.ckey
    ),
    rk AS (
        SELECT ckey, v, row_number() OVER (
                   ORDER BY v DESC, ckey ASC) AS rn
        FROM clv
    )
    SELECT ckey AS c_custkey, v AS clv_cents
    FROM rk WHERE rn <= {k}
    ORDER BY ckey
    """
    return q, sql


# ----------------------------------------------------- supplier_concentration
def _concentration_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        nat = rd.read_parquet(
            f"{sf_dir}/nation.parquet").to_pandas()
        nat_names = dict(zip(nat["n_nationkey"].astype(int),
                             nat["n_name"]))
        supp = rd.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"]).to_pandas()
        s_nat = dict(zip(supp["s_suppkey"].astype(int),
                         supp["s_nationkey"].astype(int)))

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "skey": pa.array([], type=pa.int64()),
                "rev": pa.array([], type=pa.int64()),
            })
            if "l_suppkey" not in t.column_names:
                return empty
            skey = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            bp = np.round(
                t.column("l_discount").to_numpy(
                    zero_copy_only=False) * 10000.0
            ).astype(np.int64)
            val = cents * (10000 - bp)
            uk, inv = np.unique(skey, return_inverse=True)
            rv = np.bincount(inv, weights=val.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "skey": pa.array(uk),
                "rev": pa.array(rv),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("skey").aggregate([("rev", "sum")])
            return pa.table({
                "skey": g.column("skey").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice",
                         "l_discount"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        per = tree_reduce_tables(refs, merge).to_pandas()
        per["nat"] = [s_nat[int(s)] for s in per["skey"]]

        out = {"nation": [], "n_suppliers": [], "cr4": [],
               "hhi": []}
        for natk, g in per.groupby("nat"):
            rows = sorted(zip(g["rev"], g["skey"]),
                          key=lambda r: (-int(r[0]),
                                         int(r[1])))
            tot = sum(int(r) for r, _s in rows)
            top4 = sum(int(r) for r, _s in rows[:4])
            cr4 = float(top4) / float(tot)
            hhi = 0.0
            for r, _s in rows:
                sh = float(int(r)) / float(tot)
                hhi = hhi + (sh * 100.0) * (sh * 100.0)
            out["nation"].append(nat_names[int(natk)])
            out["n_suppliers"].append(len(rows))
            out["cr4"].append(cr4)
            out["hhi"].append(hhi)
        order = sorted(range(len(out["nation"])),
                       key=lambda i: out["nation"][i])
        return pa.table({
            "nation": pa.array(
                [out["nation"][i] for i in order],
                type=pa.string()),
            "n_suppliers": pa.array(
                [out["n_suppliers"][i] for i in order],
                type=pa.int64()),
            "cr4": pa.array([out["cr4"][i] for i in order],
                            type=pa.float64()),
            "hhi": pa.array([out["hhi"][i] for i in order],
                            type=pa.float64()),
        })

    sql = """
    WITH rev AS (
        SELECT l_suppkey AS skey,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                                        0) AS BIGINT)
                        * (10000 - CAST(round_even(
                              l_discount * 10000, 0)
                              AS BIGINT))) AS BIGINT) AS r
        FROM lineitem GROUP BY 1
    ),
    pern AS (
        SELECT n.n_name AS nation, rev.skey, rev.r
        FROM rev
        JOIN supplier s ON s.s_suppkey = rev.skey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    tots AS (
        SELECT nation,
               CAST(count(*) AS BIGINT) AS ns,
               CAST(sum(r) AS BIGINT) AS tot
        FROM pern GROUP BY nation
    ),
    rk AS (
        SELECT nation, skey, r,
               row_number() OVER (PARTITION BY nation
                   ORDER BY r DESC, skey ASC) AS rn
        FROM pern
    ),
    cr AS (
        SELECT nation,
               CAST(sum(CASE WHEN rn <= 4 THEN r ELSE 0 END)
                    AS BIGINT) AS top4
        FROM rk GROUP BY nation
    ),
    hhi AS (
        SELECT rk.nation,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(rk.r AS DOUBLE)
                         / CAST(t.tot AS DOUBLE) * 100.0e0)
                        * (CAST(rk.r AS DOUBLE)
                           / CAST(t.tot AS DOUBLE)
                           * 100.0e0)
                        ORDER BY rk.rn)),
                   (x, y) -> x + y) AS h
        FROM rk JOIN tots t ON t.nation = rk.nation
        GROUP BY rk.nation
    )
    SELECT t.nation AS nation,
           t.ns AS n_suppliers,
           CAST(cr.top4 AS DOUBLE) / CAST(t.tot AS DOUBLE)
               AS cr4,
           hhi.h AS hhi
    FROM tots t
    JOIN cr ON cr.nation = t.nation
    JOIN hhi ON hhi.nation = t.nation
    ORDER BY t.nation
    """
    return q, sql


def build_wave164_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("customer_clv_discounted",) + _clv_query()))
    add(*(("supplier_concentration",)
          + _concentration_query()))
    return queries, oracles
