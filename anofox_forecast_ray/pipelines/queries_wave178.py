"""Wave-178 queries: RFM-style migration matrix, ABC-XYZ classes.

- customer_value_migration: the segment-migration dashboard — each
  customer's revenue tercile (exact order-stat boundaries, ties
  break on key via rank) in the FIRST half of the calendar is
  crossed with the SECOND half; the 4x4 matrix (3 terciles + an
  'absent' class) is all integer counts, with the immobility share
  (trace / movers) as the one division. Customers absent from a
  half land in class 3.
- part_abc_xyz: the inventory-planner's ABC-XYZ matrix — parts
  classed A/B/C by revenue rank thirds and X/Y/Z by monthly-demand
  CV^2 thirds (both exact order-stat boundaries), crossed into the
  3x3 count matrix. CV^2 per part is a ratio of integer moment
  combinations; the class boundaries are rank cutoffs, so the whole
  matrix is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


# -------------------------------------------------- customer_value_migration
def _migration_query():
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
        cells = tree_reduce_tables(refs, merge).to_pandas()
        mmin = int(cells["month"].min())
        mmax = int(cells["month"].max())
        mmid = mmin + (mmax - mmin + 1) // 2

        def classes(half):
            if half == 0:
                sub = cells[cells["month"] < mmid]
            else:
                sub = cells[cells["month"] >= mmid]
            per = sub.groupby("ckey")["cents"].sum()
            rows = sorted(zip(per.to_numpy(np.int64),
                              per.index.to_numpy(np.int64)),
                          key=lambda r: (-int(r[0]),
                                         int(r[1])))
            n = len(rows)
            c1 = (n + 2) // 3
            c2 = (2 * n + 2) // 3
            out = {}
            for i, (_c, ck) in enumerate(rows):
                out[int(ck)] = 0 if i < c1 \
                    else (1 if i < c2 else 2)
            return out

        c0 = classes(0)
        c1 = classes(1)
        allc = sorted(set(c0) | set(c1))
        mat = np.zeros((4, 4), dtype=np.int64)
        for ck in allc:
            a = c0.get(ck, 3)
            b = c1.get(ck, 3)
            mat[a, b] += 1
        trace = int(mat[0, 0] + mat[1, 1] + mat[2, 2])
        total = int(mat.sum())
        out = {"from_cls": [], "to_cls": [], "n": []}
        for a in range(4):
            for b in range(4):
                out["from_cls"].append(a)
                out["to_cls"].append(b)
                out["n"].append(int(mat[a, b]))
        return pa.table({
            "from_cls": pa.array(out["from_cls"],
                                 type=pa.int64()),
            "to_cls": pa.array(out["to_cls"],
                               type=pa.int64()),
            "n": pa.array(out["n"], type=pa.int64()),
            "immobility": pa.array(
                [float(trace) / float(total)] * 16,
                type=pa.float64()),
        })

    sql = """
    WITH o AS (
        SELECT o_custkey AS ckey,
               (year(o_orderdate) - 1970) * 12
                   + (month(o_orderdate) - 1) AS month,
               CAST(round_even(o_totalprice * 100, 0)
                    AS BIGINT) AS cents
        FROM orders
    ),
    spanx AS (
        SELECT min(month) + (max(month) - min(month) + 1)
                   // 2 AS mmid
        FROM o
    ),
    h0 AS (
        SELECT ckey, CAST(sum(cents) AS BIGINT) AS v
        FROM o, spanx WHERE month < spanx.mmid
        GROUP BY ckey
    ),
    h1 AS (
        SELECT ckey, CAST(sum(cents) AS BIGINT) AS v
        FROM o, spanx WHERE month >= spanx.mmid
        GROUP BY ckey
    ),
    r0 AS (
        SELECT ckey,
               row_number() OVER (ORDER BY v DESC,
                                  ckey ASC) AS r,
               (SELECT count(*) FROM h0) AS n
        FROM h0
    ),
    r1 AS (
        SELECT ckey,
               row_number() OVER (ORDER BY v DESC,
                                  ckey ASC) AS r,
               (SELECT count(*) FROM h1) AS n
        FROM h1
    ),
    c0 AS (
        SELECT ckey,
               CASE WHEN r <= (n + 2) // 3 THEN 0
                    WHEN r <= (2 * n + 2) // 3 THEN 1
                    ELSE 2 END AS cls
        FROM r0
    ),
    c1 AS (
        SELECT ckey,
               CASE WHEN r <= (n + 2) // 3 THEN 0
                    WHEN r <= (2 * n + 2) // 3 THEN 1
                    ELSE 2 END AS cls
        FROM r1
    ),
    allc AS (
        SELECT ckey FROM c0
        UNION SELECT ckey FROM c1
    ),
    pairs AS (
        SELECT COALESCE(c0.cls, 3) AS a,
               COALESCE(c1.cls, 3) AS b
        FROM allc
        LEFT JOIN c0 ON c0.ckey = allc.ckey
        LEFT JOIN c1 ON c1.ckey = allc.ckey
    ),
    grid AS (
        SELECT ga.a, gb.b
        FROM (SELECT unnest(generate_series(0, 3)) AS a) ga
        CROSS JOIN (SELECT unnest(generate_series(0, 3))
                        AS b) gb
    ),
    mat AS (
        SELECT grid.a, grid.b,
               CAST((SELECT count(*) FROM pairs
                     WHERE pairs.a = grid.a
                       AND pairs.b = grid.b) AS BIGINT)
                   AS n
        FROM grid
    ),
    imm AS (
        SELECT CAST(sum(CASE WHEN a = b AND a < 3
                        THEN n ELSE 0 END) AS DOUBLE)
                   / CAST(sum(n) AS DOUBLE) AS im
        FROM mat
    )
    SELECT CAST(mat.a AS BIGINT) AS from_cls,
           CAST(mat.b AS BIGINT) AS to_cls,
           mat.n AS n,
           imm.im AS immobility
    FROM mat CROSS JOIN imm
    ORDER BY mat.a, mat.b
    """
    return q, sql


# --------------------------------------------------------------- part_abc_xyz
def _abc_xyz_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "pkey": pa.array([], type=pa.int64()),
                "month": pa.array([], type=pa.int64()),
                "qty": pa.array([], type=pa.int64()),
                "rev": pa.array([], type=pa.int64()),
            })
            if "l_partkey" not in t.column_names:
                return empty
            pkey = t.column("l_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            key = pkey * np.int64(1 << 16) + month
            uk, inv = np.unique(key, return_inverse=True)
            qs = np.bincount(inv, weights=qty.astype(
                np.float64)).astype(np.int64)
            rv = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "pkey": pa.array(uk // (1 << 16)),
                "month": pa.array(uk % (1 << 16)),
                "qty": pa.array(qs),
                "rev": pa.array(rv),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["pkey", "month"]).aggregate(
                [("qty", "sum"), ("rev", "sum")])
            return pa.table({
                "pkey": g.column("pkey").cast(pa.int64()),
                "month": g.column("month").cast(pa.int64()),
                "qty": g.column("qty_sum").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                         "l_quantity", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        per = cells.groupby("pkey").agg(
            m=("month", "count"),
            sq=("qty", "sum"))
        sqq = cells.copy()
        sqq["q2"] = sqq["qty"] * sqq["qty"]
        per["sqq"] = sqq.groupby("pkey")["q2"].sum()
        per["rev"] = cells.groupby("pkey")["rev"].sum()

        # ABC by revenue rank thirds
        rows = sorted(zip(per["rev"].to_numpy(np.int64),
                          per.index.to_numpy(np.int64)),
                      key=lambda r: (-int(r[0]), int(r[1])))
        n = len(rows)
        c1 = (n + 2) // 3
        c2 = (2 * n + 2) // 3
        abc = {}
        for i, (_r, pk) in enumerate(rows):
            abc[int(pk)] = 0 if i < c1 \
                else (1 if i < c2 else 2)

        # XYZ by CV^2 = (m*sqq - sq^2) / sq^2 rank thirds
        cv_rows = []
        for pk, r in per.iterrows():
            m = int(r["m"])
            sq = int(r["sq"])
            sqq_ = int(r["sqq"])
            num = m * sqq_ - sq * sq
            cv_rows.append((num, sq * sq, int(pk)))
        # rank by the float ratio with pkey tiebreak, matching
        # the oracle's ORDER BY exactly (identical doubles order
        # identically; exact-rational ordering could disagree on
        # double-equal ratios)
        cv_rows.sort(key=lambda r: (float(r[0]) / float(r[1]),
                                    r[2]))
        xyz = {}
        for i, (_n, _d, pk) in enumerate(cv_rows):
            xyz[pk] = 0 if i < c1 \
                else (1 if i < c2 else 2)

        mat = np.zeros((3, 3), dtype=np.int64)
        for pk in abc:
            mat[abc[pk], xyz[pk]] += 1
        out = {"abc": [], "xyz": [], "n": []}
        for a in range(3):
            for b in range(3):
                out["abc"].append(a)
                out["xyz"].append(b)
                out["n"].append(int(mat[a, b]))
        return pa.table({
            "abc": pa.array(out["abc"], type=pa.int64()),
            "xyz": pa.array(out["xyz"], type=pa.int64()),
            "n": pa.array(out["n"], type=pa.int64()),
        })

    sql = """
    WITH pm AS (
        SELECT l_partkey AS pkey,
               (year(l_shipdate) - 1970) * 12
                   + (month(l_shipdate) - 1) AS month,
               CAST(sum(CAST(round_even(l_quantity, 0)
                             AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CAST(round_even(l_extendedprice
                             * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem GROUP BY 1, 2
    ),
    per AS (
        SELECT pkey,
               CAST(count(*) AS BIGINT) AS m,
               CAST(sum(qty) AS BIGINT) AS sq,
               CAST(sum(CAST(qty AS HUGEINT) * qty)
                    AS HUGEINT) AS sqq,
               CAST(sum(rev) AS BIGINT) AS rev
        FROM pm GROUP BY pkey
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
    abc AS (
        SELECT pkey,
               CASE WHEN r <= (nn.n + 2) // 3 THEN 0
                    WHEN r <= (2 * nn.n + 2) // 3 THEN 1
                    ELSE 2 END AS a
        FROM (SELECT pkey, row_number() OVER (
                  ORDER BY rev DESC, pkey ASC) AS r
              FROM per) CROSS JOIN nn
    ),
    xyz AS (
        SELECT pkey,
               CASE WHEN r <= (nn.n + 2) // 3 THEN 0
                    WHEN r <= (2 * nn.n + 2) // 3 THEN 1
                    ELSE 2 END AS x
        FROM (SELECT pkey, row_number() OVER (
                  ORDER BY CAST(m * sqq
                       - CAST(sq AS HUGEINT) * sq
                       AS DOUBLE)
                       / CAST(CAST(sq AS HUGEINT) * sq
                              AS DOUBLE) ASC,
                       pkey ASC) AS r
              FROM per) CROSS JOIN nn
    ),
    grid AS (
        SELECT ga.a, gb.b
        FROM (SELECT unnest(generate_series(0, 2)) AS a) ga
        CROSS JOIN (SELECT unnest(generate_series(0, 2))
                        AS b) gb
    )
    SELECT CAST(grid.a AS BIGINT) AS abc,
           CAST(grid.b AS BIGINT) AS xyz,
           CAST((SELECT count(*) FROM abc
                 JOIN xyz ON xyz.pkey = abc.pkey
                 WHERE abc.a = grid.a AND xyz.x = grid.b)
                AS BIGINT) AS n
    FROM grid
    ORDER BY grid.a, grid.b
    """
    return q, sql


def build_wave178_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("customer_value_migration",) + _migration_query()))
    add(*(("part_abc_xyz",) + _abc_xyz_query()))
    return queries, oracles
