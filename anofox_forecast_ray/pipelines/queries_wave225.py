"""Wave-225 queries: WOE/IV credit-scoring bands, Cramer's V.

- lineitem_woe_iv: the weight-of-evidence table a credit/risk
  scorecard builds: quantity bands 1-10/11-20/21-30/31-40/41-50
  predicting the RETURNED flag. WOE_b = ln((g_b/G)/(b_b/B)) with
  exact integer band counts (one ln per band), IV = sum (g_b/G -
  b_b/B) * WOE_b folded in band order and repeated per row.
- customer_cramers_v: Cramer's V effect size for the segment x
  nation association, V = sqrt(chi2 / (N * min(r-1, c-1))), built
  on the same exact contingency machinery as wave 194 — the
  normalized companion the chi2 alone doesn't give.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

N_BANDS = 5


def woe_iv(goods, bads):
    """goods/bads: per-band int counts. Returns (rows, iv) with
    rows = [(band, g, b, woe)]; folds in band order."""
    G = sum(goods)
    B = sum(bads)
    rows = []
    iv = 0.0
    for i in range(len(goods)):
        g = goods[i]
        b = bads[i]
        woe = math.log((g / G) / (b / B))
        iv = iv + (g / G - b / B) * woe
        rows.append((i, g, b, woe))
    return rows, iv


def cramers_v(chi2: float, n: int, r: int, c: int) -> float:
    return math.sqrt(chi2 / (n * min(r - 1, c - 1)))


# ----------------------------------------------------- lineitem_woe_iv
def _woe_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            band = np.minimum((qty - 1) // 10, N_BANDS - 1)
            bad = (np.asarray(t.column("l_returnflag")
                              .to_pylist()) == "R").astype(
                np.int64)
            g = np.bincount(band[bad == 0],
                            minlength=N_BANDS).astype(np.int64)
            b = np.bincount(band[bad == 1],
                            minlength=N_BANDS).astype(np.int64)
            return pa.table({
                "band": pa.array(np.arange(N_BANDS,
                                           dtype=np.int64)),
                "g": pa.array(g), "b": pa.array(b),
            })

        def merge(t: pa.Table) -> pa.Table:
            gg = t.group_by("band").aggregate(
                [("g", "sum"), ("b", "sum")])
            return pa.table({
                "band": gg.column("band").cast(pa.int64()),
                "g": gg.column("g_sum").cast(pa.int64()),
                "b": gg.column("b_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_quantity", "l_returnflag"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("band").reset_index(drop=True)
        rows, iv = woe_iv([int(v) for v in h["g"]],
                          [int(v) for v in h["b"]])
        return pa.table({
            "band": pa.array([r[0] for r in rows],
                             type=pa.int64()),
            "n_kept": pa.array([r[1] for r in rows],
                               type=pa.int64()),
            "n_returned": pa.array([r[2] for r in rows],
                                   type=pa.int64()),
            "woe": pa.array([r[3] for r in rows],
                            type=pa.float64()),
            "iv_total": pa.array([iv] * len(rows),
                                 type=pa.float64()),
        })

    sql = f"""
    WITH li AS (
        SELECT least((CAST(round_even(l_quantity, 0) AS BIGINT)
                      - 1) // 10, {N_BANDS - 1}) AS band,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
                   AS bad
        FROM lineitem
    ),
    bands AS (
        SELECT band,
               CAST(sum(1 - bad) AS BIGINT) AS g,
               CAST(sum(bad) AS BIGINT) AS b
        FROM li GROUP BY band
    ),
    tot AS (
        SELECT CAST(sum(g) AS BIGINT) AS gg,
               CAST(sum(b) AS BIGINT) AS bb
        FROM bands
    ),
    iv AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list((CAST(g AS DOUBLE)
                  / CAST((SELECT gg FROM tot) AS DOUBLE)
                  - CAST(b AS DOUBLE)
                    / CAST((SELECT bb FROM tot) AS DOUBLE))
                 * ln((CAST(g AS DOUBLE)
                       / CAST((SELECT gg FROM tot) AS DOUBLE))
                      / (CAST(b AS DOUBLE)
                         / CAST((SELECT bb FROM tot)
                                AS DOUBLE)))
                 ORDER BY band)), (p, v) -> p + v) AS total
        FROM bands
    )
    SELECT band, g AS n_kept, b AS n_returned,
           ln((CAST(g AS DOUBLE)
               / CAST((SELECT gg FROM tot) AS DOUBLE))
              / (CAST(b AS DOUBLE)
                 / CAST((SELECT bb FROM tot) AS DOUBLE)))
               AS woe,
           (SELECT total FROM iv) AS iv_total
    FROM bands
    """
    return q, sql


# -------------------------------------------------- customer_cramers_v
def _cramers_query():
    def q(sf_dir: str):
        from .queries_wave194 import _contingency_query

        inner, _ = _contingency_query()
        res = inner(sf_dir).to_pandas()
        chi2 = float(res["chi2_indep"].iloc[0])
        n = int(res["n_customers"].iloc[0])
        # r, c from the same bounded margins
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_nationkey",
                                   "c_mktsegment"])
        r = len(set(t.column("c_nationkey").to_pylist()))
        c = len(set(t.column("c_mktsegment").to_pylist()))
        v = cramers_v(chi2, n, r, c)
        return pa.table({
            "n_customers": pa.array([n], type=pa.int64()),
            "cramers_v": pa.array([v], type=pa.float64()),
        })

    from .queries_wave194 import _contingency_query

    _, chi_sql = _contingency_query()
    sql = f"""
    WITH chi AS ({chi_sql}),
    dims AS (
        SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT)
                   AS r,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT)
                   AS c
        FROM customer
    )
    SELECT chi.n_customers,
           sqrt(chi.chi2_indep
                / CAST(chi.n_customers
                       * least(dims.r - 1, dims.c - 1)
                       AS DOUBLE)) AS cramers_v
    FROM chi CROSS JOIN dims
    """
    return q, sql


def build_wave225_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_woe_iv",) + _woe_query()))
    add(*(("customer_cramers_v",) + _cramers_query()))
    return queries, oracles
