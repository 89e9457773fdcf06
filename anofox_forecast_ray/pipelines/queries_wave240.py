"""Wave-240 query: James-Stein shrinkage of group means.

customer_james_stein: the empirical-Bayes estimator that dominates
the MLE — per-nation mean account balances (cents) shrunk toward
the grand mean: js_i = mbar + c (xbar_i - mbar) with
c = max(0, 1 - (k-3) * vbar / S), where vbar is the average
sampling variance pooled_var / n_i (pooled ddof-1 within variance
from int moments) and S = sum_i (xbar_i - mbar)^2 (fold in nation
order; mbar is the unweighted mean of group means, the standard
equal-variance JS setup). Emits the 25 (nation, raw, js) rows —
shrinkage visibly pulls small-nation noise toward the center.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols


def james_stein(ns, s1s, s2s):
    """rows [(idx, raw_mean, js_mean)] + c; folds in group
    order."""
    k = len(ns)
    means = []
    for n, s1 in zip(ns, s1s):
        means.append(s1 / n)
    mbar = 0.0
    for m in means:
        mbar = mbar + m
    mbar = mbar / k
    ssw = 0.0
    dfw = 0
    for n, s1, s2 in zip(ns, s1s, s2s):
        ssw = ssw + (float(s2) - float(s1) * float(s1) / n)
        dfw += n - 1
    pooled = ssw / dfw
    vbar = 0.0
    for n in ns:
        vbar = vbar + pooled / n
    vbar = vbar / k
    s = 0.0
    for m in means:
        s = s + (m - mbar) * (m - mbar)
    c = 1.0e0 - (k - 3) * vbar / s
    if c < 0.0:
        c = 0.0
    rows = []
    for i, m in enumerate(means):
        rows.append((i, m, mbar + c * (m - mbar)))
    return rows, c


# ------------------------------------------------ customer_james_stein
def _js_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            nk = t.column("c_nationkey").cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            cents = np.round(t.column("c_acctbal").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            import pandas as pd

            df = pd.DataFrame({"g": nk, "x": cents})
            gg = (df.groupby("g")
                  .agg(n=("x", "size"), s1=("x", "sum"),
                       s2=("x", lambda s: int(
                           (s.to_numpy(np.int64) ** 2).sum())))
                  .reset_index())
            return pa.table({
                "g": pa.array(gg["g"].astype("int64")),
                "n": pa.array(gg["n"].astype("int64")),
                "s1": pa.array(gg["s1"].astype("int64")),
                "s2": pa.array(gg["s2"].astype("int64")),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("g").aggregate(
                [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
            return pa.table({
                "g": g.column("g").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "s1": g.column("s1_sum").cast(pa.int64()),
                "s2": g.column("s2_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("g").reset_index(drop=True)
        rows, c = james_stein([int(v) for v in h["n"]],
                              [int(v) for v in h["s1"]],
                              [int(v) for v in h["s2"]])
        nations = [int(v) for v in h["g"]]
        return pa.table({
            "nation": pa.array(nations, type=pa.int64()),
            "raw_mean": pa.array([r[1] for r in rows],
                                 type=pa.float64()),
            "js_mean": pa.array([r[2] for r in rows],
                                type=pa.float64()),
        })

    sql = """
    WITH g AS (
        SELECT CAST(c_nationkey AS BIGINT) AS g,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round_even(c_acctbal * 100, 0)
                             AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round_even(c_acctbal * 100, 0)
                             AS BIGINT)
                        * CAST(round_even(c_acctbal * 100, 0)
                               AS BIGINT)) AS BIGINT) AS s2
        FROM customer GROUP BY 1
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM g),
    mb AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                        ORDER BY g)), (p, v) -> p + v)
               / CAST((SELECT k FROM kk) AS DOUBLE) AS mbar
        FROM g
    ),
    pw AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE)
                          * CAST(s1 AS DOUBLE)
                          / CAST(n AS DOUBLE) ORDER BY g)),
                   (p, v) -> p + v)
               / CAST((SELECT sum(n) - count(*) FROM g)
                      AS DOUBLE) AS pooled
        FROM g
    ),
    vb AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((SELECT pooled FROM pw)
                        / CAST(n AS DOUBLE) ORDER BY g)),
                   (p, v) -> p + v)
               / CAST((SELECT k FROM kk) AS DOUBLE) AS vbar
        FROM g
    ),
    ss AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                         - (SELECT mbar FROM mb))
                        * (CAST(s1 AS DOUBLE)
                           / CAST(n AS DOUBLE)
                           - (SELECT mbar FROM mb))
                        ORDER BY g)), (p, v) -> p + v) AS s
        FROM g
    ),
    cc AS (
        SELECT greatest(0.0e0,
                   1.0e0 - CAST((SELECT k FROM kk) - 3
                                AS DOUBLE)
                           * (SELECT vbar FROM vb)
                           / (SELECT s FROM ss)) AS c
        FROM (SELECT 1)
    )
    SELECT g.g AS nation,
           CAST(g.s1 AS DOUBLE) / CAST(g.n AS DOUBLE)
               AS raw_mean,
           (SELECT mbar FROM mb)
           + (SELECT c FROM cc)
             * (CAST(g.s1 AS DOUBLE) / CAST(g.n AS DOUBLE)
                - (SELECT mbar FROM mb)) AS js_mean
    FROM g
    """
    return q, sql


def build_wave240_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("customer_james_stein",) + _js_query()))
    return queries, oracles
