"""Wave-199 queries: Fellegi-Sunter linkage weights, Gelman-Rubin.

- orders_fellegi_sunter: the parameterization step of probabilistic
  record linkage (Fellegi & Sunter 1969): for each blocking field
  the u-probability — the chance two RANDOM records agree — is the
  exact birthday sum u = sum_v c_v^2 / N^2 over the field's value
  histogram (integer numerator), and the field's agreement weight
  is log2(m/u) with the conventional m = 0.95. Emits one row per
  field (custkey, value cents, order day, priority) with the exact
  integer u-numerator and the weight — the numbers a dedup rule
  engine feeds on.
- source_rhat: the Gelman-Rubin potential-scale-reduction factor
  R-hat treating the 20 sources as 20 EQUAL-LENGTH chains of doc
  lengths (the corpus assigns docs to sources round-robin, so
  chains are balanced by construction): B = n * var(chain means),
  W = mean(chain vars), varplus = (n-1)/n W + B/n, R = sqrt(
  varplus/W). Per-source int moments; folds in source order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
FS_M = 0.95e0
FS_FIELDS = ["o_custkey", "value_cents", "order_day", "priority"]


def fs_weight(u_num: int, n: int) -> tuple[float, float]:
    """(u, weight) from the exact collision numerator."""
    u = u_num / (n * n)
    return u, math.log2(FS_M / u)


def rhat_from_moments(ns, s1s, s2s):
    """Equal-n chains; returns (w, b, rhat) with folds in order."""
    m = len(ns)
    n = ns[0]
    means = []
    varis = []
    for nn, s1, s2 in zip(ns, s1s, s2s):
        mu = s1 / nn
        means.append(mu)
        varis.append((float(s2) - float(s1) * float(s1) / nn)
                     / (nn - 1))
    gm = 0.0
    for v in means:
        gm = gm + v
    gm = gm / m
    bsum = 0.0
    for v in means:
        bsum = bsum + (v - gm) * (v - gm)
    b = n * (bsum / (m - 1))
    w = 0.0
    for v in varis:
        w = w + v
    w = w / m
    varplus = (n - 1) / n * w + b / n
    return w, b, math.sqrt(varplus / w)


# ------------------------------------------------ orders_fellegi_sunter
def _fs_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            ck = t.column("o_custkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cents = np.round(t.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            day = (t.column("o_orderdate").cast(pa.int64())
                   .to_numpy(zero_copy_only=False) // US_PER_DAY)
            pr = np.asarray(
                t.column("o_orderpriority").to_pylist(),
                dtype=object)
            pr_code = np.array([ord(p[0]) for p in pr],
                               dtype=np.int64)
            rows = {"field": [], "v": [], "c": []}
            for name, vals in (("o_custkey", ck),
                               ("value_cents", cents),
                               ("order_day", day),
                               ("priority", pr_code)):
                uk, cnt = np.unique(vals, return_counts=True)
                rows["field"].extend([name] * uk.size)
                rows["v"].extend(int(x) for x in uk)
                rows["c"].extend(int(x) for x in cnt)
            return pa.table({
                "field": pa.array(rows["field"],
                                  type=pa.string()),
                "v": pa.array(rows["v"], type=pa.int64()),
                "c": pa.array(rows["c"], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            g = (df.groupby(["field", "v"])["c"].sum()
                 .reset_index())
            return pa.table({
                "field": pa.array(g["field"], type=pa.string()),
                "v": pa.array(g["v"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice",
                         "o_orderdate", "o_orderpriority"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        out = {"field": [], "u_numerator": [], "n_rows": [],
               "u_prob": [], "weight_bits": []}
        n = int(h[h["field"] == "o_custkey"]["c"].sum())
        for f in FS_FIELDS:
            sub = h[h["field"] == f]
            u_num = int((sub["c"].to_numpy(np.int64) ** 2).sum())
            u, w = fs_weight(u_num, n)
            out["field"].append(f)
            out["u_numerator"].append(u_num)
            out["n_rows"].append(n)
            out["u_prob"].append(u)
            out["weight_bits"].append(w)
        return pa.table({
            "field": pa.array(out["field"], type=pa.string()),
            "u_numerator": pa.array(out["u_numerator"],
                                    type=pa.int64()),
            "n_rows": pa.array(out["n_rows"], type=pa.int64()),
            "u_prob": pa.array(out["u_prob"], type=pa.float64()),
            "weight_bits": pa.array(out["weight_bits"],
                                    type=pa.float64()),
        })

    sql = f"""
    WITH o AS (
        SELECT CAST(o_custkey AS BIGINT) AS f_custkey,
               CAST(round_even(o_totalprice * 100, 0) AS BIGINT)
                   AS f_cents,
               epoch_us(o_orderdate) // {US_PER_DAY} AS f_day,
               CAST(unicode(substr(o_orderpriority, 1, 1))
                    AS BIGINT) AS f_prio
        FROM orders
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
    hists AS (
        SELECT 'o_custkey' AS field,
               CAST(sum(c * c) AS BIGINT) AS u_num
        FROM (SELECT f_custkey, CAST(count(*) AS BIGINT) AS c
              FROM o GROUP BY 1)
        UNION ALL
        SELECT 'value_cents',
               CAST(sum(c * c) AS BIGINT)
        FROM (SELECT f_cents, CAST(count(*) AS BIGINT) AS c
              FROM o GROUP BY 1)
        UNION ALL
        SELECT 'order_day',
               CAST(sum(c * c) AS BIGINT)
        FROM (SELECT f_day, CAST(count(*) AS BIGINT) AS c
              FROM o GROUP BY 1)
        UNION ALL
        SELECT 'priority',
               CAST(sum(c * c) AS BIGINT)
        FROM (SELECT f_prio, CAST(count(*) AS BIGINT) AS c
              FROM o GROUP BY 1)
    )
    SELECT field, u_num AS u_numerator,
           (SELECT n FROM nn) AS n_rows,
           CAST(u_num AS DOUBLE)
               / CAST((SELECT n FROM nn)
                      * (SELECT n FROM nn) AS DOUBLE) AS u_prob,
           log2({FS_M!r} / (CAST(u_num AS DOUBLE)
               / CAST((SELECT n FROM nn)
                      * (SELECT n FROM nn) AS DOUBLE)))
               AS weight_bits
    FROM hists
    """
    return q, sql


# ------------------------------------------------------- source_rhat
def _rhat_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            src = np.asarray(t.column("source").to_pylist(),
                             dtype=object)
            v = t.column("n_chars").to_numpy(
                zero_copy_only=False).astype(np.int64)
            uk = np.unique(src)
            rows = {"src": [], "n": [], "s1": [], "s2": []}
            for s in uk:
                m = src == s
                x = v[m]
                rows["src"].append(str(s))
                rows["n"].append(int(m.sum()))
                rows["s1"].append(int(x.sum()))
                rows["s2"].append(int((x * x).sum()))
            return pa.table({
                "src": pa.array(rows["src"], type=pa.string()),
                "n": pa.array(rows["n"], type=pa.int64()),
                "s1": pa.array(rows["s1"], type=pa.int64()),
                "s2": pa.array(rows["s2"], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("src").aggregate(
                [("n", "sum"), ("s1", "sum"), ("s2", "sum")])
            return pa.table({
                "src": g.column("src").cast(pa.string()),
                "n": g.column("n_sum").cast(pa.int64()),
                "s1": g.column("s1_sum").cast(pa.int64()),
                "s2": g.column("s2_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "documents", ["source", "n_chars"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("src").reset_index(drop=True)
        w, b, r = rhat_from_moments(
            [int(v) for v in h["n"]],
            [int(v) for v in h["s1"]],
            [int(v) for v in h["s2"]])
        return pa.table({
            "m_chains": pa.array([len(h)], type=pa.int64()),
            "w_within": pa.array([w], type=pa.float64()),
            "b_between": pa.array([b], type=pa.float64()),
            "rhat": pa.array([r], type=pa.float64()),
        })

    sql = """
    WITH g AS (
        SELECT source AS src,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS s1,
               CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
        FROM documents GROUP BY source
    ),
    v AS (
        SELECT src, n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               (CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
                   AS s2i
        FROM g
    ),
    mm AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(min(n) AS BIGINT) AS n
        FROM v
    ),
    gm AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(mu ORDER BY src)), (p, x) -> p + x)
                   / CAST((SELECT m FROM mm) AS DOUBLE) AS g
        FROM v
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((mu - gm.g) * (mu - gm.g) ORDER BY src)),
                (p, x) -> p + x) AS bsum,
            list_reduce(list_prepend(0.0e0,
                list(s2i ORDER BY src)), (p, x) -> p + x) AS wsum
        FROM v CROSS JOIN gm GROUP BY gm.g
    )
    SELECT (SELECT m FROM mm) AS m_chains,
           folds.wsum / CAST((SELECT m FROM mm) AS DOUBLE)
               AS w_within,
           CAST((SELECT n FROM mm) AS DOUBLE)
               * (folds.bsum
                  / CAST((SELECT m FROM mm) - 1 AS DOUBLE))
               AS b_between,
           sqrt((CAST((SELECT n FROM mm) - 1 AS DOUBLE)
                 / CAST((SELECT n FROM mm) AS DOUBLE)
                 * (folds.wsum
                    / CAST((SELECT m FROM mm) AS DOUBLE))
                 + (CAST((SELECT n FROM mm) AS DOUBLE)
                    * (folds.bsum
                       / CAST((SELECT m FROM mm) - 1
                              AS DOUBLE)))
                   / CAST((SELECT n FROM mm) AS DOUBLE))
                / (folds.wsum
                   / CAST((SELECT m FROM mm) AS DOUBLE)))
               AS rhat
    FROM folds
    """
    return q, sql


def build_wave199_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_fellegi_sunter",) + _fs_query()))
    add(*(("source_rhat",) + _rhat_query()))
    return queries, oracles
