"""Wave-145 queries: polynomial-kernel MMD, price index numbers.

- embedding_mmd_poly: maximum mean discrepancy between label-0 and
  label-1 embedding cohorts under the degree-2 polynomial kernel
  k(x,y) = (x.y + 1)^2. Dots are EXACT int64 in micro-units
  (round_even(x*1e6), the repo's embedding convention), so the only
  floats are one scaling division per pair and the (qid, rid)-ordered
  kernel-sum folds; the biased V-statistic
  MMD^2 = Sxx/n0^2 + Syy/n1^2 - 2 Sxy/(n0 n1) is scalar arithmetic.
- lineitem_price_index: Laspeyres / Paasche / Fisher price indices
  between a base year (1996) and a report year (1999) over parts
  traded in BOTH years. Unit prices are revenue-cents / quantity per
  (part, year) — one division per part folded in partkey order —
  and the two index denominators that algebra makes exact
  (sum c0, sum c1) stay integers.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

MMD_LA = 0
MMD_LB = 1
MMD_SCALE2 = 1e12  # micro-units squared
PI_Y0 = 1996
PI_Y1 = 1999


# --------------------------------------------------------- embedding_mmd_poly
def _mmd_query(la: int = MMD_LA, lb: int = MMD_LB):
    def q(sf_dir: str):
        import ray.data as rd

        emb = rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"]
        ).to_pandas()
        emb = emb.sort_values("vec_id").reset_index(drop=True)

        def mat(lbl):
            sub = emb[emb["label"] == lbl]
            m = np.stack([
                np.round(np.asarray(v, dtype=np.float64)
                         * 1000000.0).astype(np.int64)
                for v in sub["embedding"]])
            return m

        ma = mat(la)
        mb = mat(lb)
        n0, n1 = len(ma), len(mb)

        def ksum(x, y):
            # fold over (qid, rid) order == row-major double loop
            acc = 0.0
            for i in range(len(x)):
                row = x[i]
                for j in range(len(y)):
                    d = int(np.dot(row, y[j]))  # exact int64
                    kf = (float(d) / MMD_SCALE2) + 1.0
                    acc = acc + kf * kf
            return acc

        sxx = ksum(ma, ma)
        syy = ksum(mb, mb)
        sxy = ksum(ma, mb)
        mmd2 = (sxx / (float(n0) * float(n0))
                + syy / (float(n1) * float(n1))
                - 2.0 * (sxy / (float(n0) * float(n1))))
        return pa.table({
            "n_a": pa.array([n0], type=pa.int64()),
            "n_b": pa.array([n1], type=pa.int64()),
            "sxx": pa.array([sxx], type=pa.float64()),
            "syy": pa.array([syy], type=pa.float64()),
            "sxy": pa.array([sxy], type=pa.float64()),
            "mmd2": pa.array([mmd2], type=pa.float64()),
        })

    sql = f"""
    WITH q AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               CAST(round_even(
                   CAST(unnest(embedding) AS DOUBLE) * 1000000,
                   0) AS BIGINT) AS m
        FROM embeddings WHERE label IN ({la}, {lb})
    ),
    dots AS (
        SELECT a.vec_id AS qid, a.label AS qlab,
               b.vec_id AS rid, b.label AS rlab,
               CAST(sum(a.m * b.m) AS BIGINT) AS d
        FROM q a JOIN q b ON a.i = b.i
        GROUP BY 1, 2, 3, 4
    ),
    ks AS (
        SELECT qid, qlab, rid, rlab,
               ((CAST(d AS DOUBLE) / 1000000000000.0e0)
                + 1.0e0)
               * ((CAST(d AS DOUBLE) / 1000000000000.0e0)
                  + 1.0e0) AS k
        FROM dots
    ),
    nn AS (
        SELECT CAST(sum(CASE WHEN label = {la}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN label = {lb}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM embeddings WHERE label IN ({la}, {lb})
    ),
    sums AS (
        SELECT
            (SELECT list_reduce(list_prepend(0.0e0,
                 list(k ORDER BY qid, rid)), (x, y) -> x + y)
             FROM ks WHERE qlab = {la} AND rlab = {la})
                AS sxx,
            (SELECT list_reduce(list_prepend(0.0e0,
                 list(k ORDER BY qid, rid)), (x, y) -> x + y)
             FROM ks WHERE qlab = {lb} AND rlab = {lb})
                AS syy,
            (SELECT list_reduce(list_prepend(0.0e0,
                 list(k ORDER BY qid, rid)), (x, y) -> x + y)
             FROM ks WHERE qlab = {la} AND rlab = {lb})
                AS sxy
    )
    SELECT nn.n0 AS n_a, nn.n1 AS n_b,
           sums.sxx AS sxx, sums.syy AS syy, sums.sxy AS sxy,
           sums.sxx / (CAST(nn.n0 AS DOUBLE)
                       * CAST(nn.n0 AS DOUBLE))
           + sums.syy / (CAST(nn.n1 AS DOUBLE)
                         * CAST(nn.n1 AS DOUBLE))
           - 2.0e0 * (sums.sxy / (CAST(nn.n0 AS DOUBLE)
                                  * CAST(nn.n1 AS DOUBLE)))
               AS mmd2
    FROM nn CROSS JOIN sums
    """
    return q, sql


# -------------------------------------------------------- lineitem_price_index
def _price_index_query(y0: int = PI_Y0, y1: int = PI_Y1):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "pkey": pa.array([], type=pa.int64()),
                "year": pa.array([], type=pa.int16()),
                "cents": pa.array([], type=pa.int64()),
                "qty": pa.array([], type=pa.int64()),
            })
            if "l_partkey" not in t.column_names:
                return empty
            pkey = t.column("l_partkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            year = (ship.astype("datetime64[us]")
                    .astype("datetime64[Y]").astype(np.int64)
                    + 1970)
            keep = (year == y0) | (year == y1)
            pkey, year = pkey[keep], year[keep]
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False)[keep] * 100.0
            ).astype(np.int64)
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)[keep]).astype(np.int64)
            key = pkey * 4 + (year == y1).astype(np.int64)
            uk, inv = np.unique(key, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            qs = np.bincount(inv, weights=qty.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "pkey": pa.array(uk // 4),
                "year": pa.array(
                    np.where(uk % 4 == 1, y1, y0).astype(
                        np.int16), type=pa.int16()),
                "cents": pa.array(cs),
                "qty": pa.array(qs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["pkey", "year"]).aggregate(
                [("cents", "sum"), ("qty", "sum")])
            return pa.table({
                "pkey": g.column("pkey").cast(pa.int64()),
                "year": g.column("year").cast(pa.int16()),
                "cents": g.column("cents_sum").cast(
                    pa.int64()),
                "qty": g.column("qty_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_partkey", "l_shipdate",
                         "l_extendedprice", "l_quantity"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        p0 = cells[cells["year"] == y0].set_index("pkey")
        p1 = cells[cells["year"] == y1].set_index("pkey")
        common = sorted(set(p0.index) & set(p1.index))

        sc0 = 0
        sc1 = 0
        lnum = 0.0   # sum (c1/q1) * q0
        pden = 0.0   # sum (c0/q0) * q1
        for pk in common:
            c0 = int(p0.loc[pk, "cents"])
            q0 = int(p0.loc[pk, "qty"])
            c1 = int(p1.loc[pk, "cents"])
            q1 = int(p1.loc[pk, "qty"])
            sc0 += c0
            sc1 += c1
            lnum = lnum + (float(c1) / float(q1)) * float(q0)
            pden = pden + (float(c0) / float(q0)) * float(q1)
        lasp = lnum / float(sc0)
        paasche = float(sc1) / pden
        fisher = math.sqrt(lasp * paasche)
        return pa.table({
            "n_parts": pa.array([len(common)],
                                type=pa.int64()),
            "base_cents": pa.array([sc0], type=pa.int64()),
            "report_cents": pa.array([sc1], type=pa.int64()),
            "laspeyres": pa.array([lasp], type=pa.float64()),
            "paasche": pa.array([paasche],
                                type=pa.float64()),
            "fisher": pa.array([fisher], type=pa.float64()),
        })

    sql = f"""
    WITH cells AS (
        SELECT l_partkey AS pkey,
               CAST(year(l_shipdate) AS SMALLINT) AS year,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                                        0) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(sum(CAST(round_even(l_quantity, 0)
                             AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE year(l_shipdate) IN ({y0}, {y1})
        GROUP BY 1, 2
    ),
    both_ AS (
        SELECT a.pkey,
               a.cents AS c0, a.qty AS q0,
               b.cents AS c1, b.qty AS q1
        FROM cells a JOIN cells b ON b.pkey = a.pkey
        WHERE a.year = {y0} AND b.year = {y1}
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(c0) AS BIGINT) AS sc0,
               CAST(sum(c1) AS BIGINT) AS sc1,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(c1 AS DOUBLE)
                         / CAST(q1 AS DOUBLE))
                        * CAST(q0 AS DOUBLE)
                        ORDER BY pkey)), (x, y) -> x + y)
                   AS lnum,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(c0 AS DOUBLE)
                         / CAST(q0 AS DOUBLE))
                        * CAST(q1 AS DOUBLE)
                        ORDER BY pkey)), (x, y) -> x + y)
                   AS pden
        FROM both_
    )
    SELECT n_parts,
           sc0 AS base_cents,
           sc1 AS report_cents,
           lnum / CAST(sc0 AS DOUBLE) AS laspeyres,
           CAST(sc1 AS DOUBLE) / pden AS paasche,
           sqrt((lnum / CAST(sc0 AS DOUBLE))
                * (CAST(sc1 AS DOUBLE) / pden)) AS fisher
    FROM agg
    """
    return q, sql


def build_wave145_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("embedding_mmd_poly",) + _mmd_query()))
    add(*(("lineitem_price_index",) + _price_index_query()))
    return queries, oracles
