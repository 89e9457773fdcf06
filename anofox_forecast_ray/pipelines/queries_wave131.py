"""Wave-131 queries: Chatterjee's xi, two-sample energy distance.

- lineitem_chatterjee_xi: Chatterjee's rank correlation (JASA 2021)
  of extended price against quantity, xi = 1 - 3*sum|r_{i+1}-r_i| /
  (n^2-1), fully integer until one final division. The y-ranks
  r_i = #{y_j <= y_i} come from the global cents histogram
  (broadcast once, searchsorted per batch); the x-sorted adjacency
  decomposes into 50 bounded quantity buckets — each bucket's
  |diff| sum is computed inside one task ordered by the
  deterministic (okey, linenumber, r) tiebreak — (okey, linenumber)
  alone is NOT unique in this corpus, and r is a function of cents
  so equal keys are interchangeable — and only 50
  (sum, first_r, last_r) triples reach the driver, which adds the
  49 boundary terms. The oracle replays r with a RANGE window count
  and the same total order.
- doc_energy_distance: Szekely's energy distance between the
  doc-length distributions of two multiplicative-hash doc cohorts.
  All three |.|-sums are exact integers over bounded (cohort, len)
  histogram CELL pairs (never row pairs); E = 2A - B - C and the
  (nm/(n+m)) test statistic are spelled identically on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks, corpus_ds
from ._scaffold import read_cols

HASH_A = 2654435761


# ------------------------------------------------------ lineitem_chatterjee_xi
def _chatterjee_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def hist_partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "cents": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if ("l_extendedprice" not in t.column_names
                    or t.num_rows == 0):
                return empty
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            uv, c = np.unique(cents, return_counts=True)
            return pa.table({
                "cents": pa.array(uv),
                "cnt": pa.array(c.astype(np.int64)),
            })

        def hist_merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cents").aggregate([("cnt", "sum")])
            return pa.table({
                "cents": g.column("cents").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        def read():
            return read_cols(sf_dir, "lineitem", ["l_quantity", "l_extendedprice",
                         "l_orderkey", "l_linenumber"])

        refs = list(
            read().map_batches(hist_partial,
                               batch_format="pyarrow")
            .to_arrow_refs()
        )
        hist = tree_reduce_tables(refs, hist_merge).to_pandas()
        hist = hist.sort_values("cents").reset_index(drop=True)
        vals = hist["cents"].to_numpy(np.int64)
        cum = np.cumsum(hist["cnt"].to_numpy(np.int64))
        n = int(cum[-1])
        v_ref = ray.put(vals)
        c_ref = ray.put(cum)

        def prep(t: pa.Table) -> pa.Table:
            vs = ray.get(v_ref)
            cs = ray.get(c_ref)
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            pos = np.searchsorted(vs, cents, side="right") - 1
            r = cs[pos]
            return pa.table({
                "q": pa.array(qty),
                "okey": t.column("l_orderkey").cast(pa.int64()),
                "ln": t.column("l_linenumber").cast(pa.int64()),
                "r": pa.array(r.astype(np.int64)),
            })

        def bucket(g: pa.Table) -> pa.Table:
            g = g.sort_by([("okey", "ascending"),
                           ("ln", "ascending"),
                           ("r", "ascending")])
            r = g.column("r").to_numpy(zero_copy_only=False)
            s = int(np.abs(np.diff(r)).sum()) if r.size > 1 \
                else 0
            return pa.table({
                "q": pa.array([int(g.column("q")[0].as_py())],
                              type=pa.int64()),
                "s_within": pa.array([s], type=pa.int64()),
                "r_first": pa.array([int(r[0])],
                                    type=pa.int64()),
                "r_last": pa.array([int(r[-1])],
                                   type=pa.int64()),
                "cnt": pa.array([int(r.size)],
                                type=pa.int64()),
            })

        parts = (
            read().map_batches(prep, batch_format="pyarrow")
            .groupby("q")
            .map_groups(bucket, batch_format="pyarrow")
            .to_pandas()
        )
        parts = parts.sort_values("q").reset_index(drop=True)
        s_tot = int(parts["s_within"].sum())
        rl = parts["r_last"].to_numpy(np.int64)
        rf = parts["r_first"].to_numpy(np.int64)
        for i in range(len(parts) - 1):
            s_tot += abs(int(rf[i + 1]) - int(rl[i]))
        xi = 1.0 - float(3 * s_tot) / float(n * n - 1)
        return pa.table({
            "n_rows": pa.array([n], type=pa.int64()),
            "s_sum": pa.array([s_tot], type=pa.int64()),
            "xi": pa.array([xi], type=pa.float64()),
        })

    sql = """
    WITH base AS (
        SELECT CAST(round_even(l_quantity, 0) AS BIGINT) AS q,
               l_orderkey AS okey, l_linenumber AS ln,
               CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) AS cents
        FROM lineitem
    ),
    ranked AS (
        SELECT q, okey, ln,
               CAST(count(*) OVER (ORDER BY cents)
                    AS BIGINT) AS r
        FROM base
    ),
    seq AS (
        SELECT r,
               lag(r) OVER (ORDER BY q, okey, ln, r) AS pr
        FROM ranked
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(abs(r - pr)) AS BIGINT) AS s_sum
        FROM seq
    )
    SELECT n AS n_rows,
           s_sum,
           1.0e0 - CAST(3 * CAST(s_sum AS HUGEINT) AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * n - 1 AS DOUBLE)
               AS xi
    FROM agg
    """
    return q, sql


# -------------------------------------------------------- doc_energy_distance
def _energy_query():
    def q(sf_dir: str):
        from ..stages.rollup import _flat_tokens
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "g": pa.array([], type=pa.int64()),
                "len": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "tokens" not in t.column_names or t.num_rows == 0:
                return empty
            _values, lengths = _flat_tokens(t)
            did = t.column("doc_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            g = ((did * np.int64(HASH_A)) % np.int64(1 << 32)) \
                >> np.int64(31)
            shift = np.int64(1 << 22)
            keys = g.astype(np.int64) * shift \
                + lengths.astype(np.int64)
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "g": pa.array(uk // shift),
                "len": pa.array(uk % shift, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["g", "len"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "g": g.column("g").cast(pa.int64()),
                "len": g.column("len").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            corpus_ds(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        va = h.loc[h["g"] == 0, "len"].to_numpy(np.int64)
        ca = h.loc[h["g"] == 0, "cnt"].to_numpy(np.int64)
        vb = h.loc[h["g"] == 1, "len"].to_numpy(np.int64)
        cb = h.loc[h["g"] == 1, "cnt"].to_numpy(np.int64)

        def pair_sum(v1, c1, v2, c2):
            d = np.abs(v1[:, None] - v2[None, :])
            w = c1[:, None] * c2[None, :]
            return int((d * w).sum())

        sxy = pair_sum(va, ca, vb, cb)
        sxx = pair_sum(va, ca, va, ca)
        syy = pair_sum(vb, cb, vb, cb)
        n = int(ca.sum())
        m = int(cb.sum())
        exy = float(sxy) / float(n * m)
        exx = float(sxx) / float(n * n)
        eyy = float(syy) / float(m * m)
        e = 2.0 * exy - exx - eyy
        t_stat = (float(n * m) / float(n + m)) * e
        return pa.table({
            "n_a": pa.array([n], type=pa.int64()),
            "n_b": pa.array([m], type=pa.int64()),
            "sum_xy": pa.array([sxy], type=pa.int64()),
            "e_dist": pa.array([e], type=pa.float64()),
            "t_stat": pa.array([t_stat], type=pa.float64()),
        })

    sql = f"""
    WITH lens AS (
        SELECT ((CAST(doc_id AS BIGINT) * {HASH_A})
                % 4294967296) // 2147483648 AS g,
               CAST(length(text) AS BIGINT) AS len
        FROM documents
    ),
    cells AS (
        SELECT g, len, CAST(count(*) AS BIGINT) AS cnt
        FROM lens GROUP BY 1, 2
    ),
    sums AS (
        SELECT
            (SELECT CAST(sum(CAST(a.cnt AS HUGEINT) * b.cnt
                             * abs(a.len - b.len)) AS HUGEINT)
             FROM cells a JOIN cells b
             ON a.g = 0 AND b.g = 1) AS sxy,
            (SELECT CAST(sum(CAST(a.cnt AS HUGEINT) * b.cnt
                             * abs(a.len - b.len)) AS HUGEINT)
             FROM cells a JOIN cells b
             ON a.g = 0 AND b.g = 0) AS sxx,
            (SELECT CAST(sum(CAST(a.cnt AS HUGEINT) * b.cnt
                             * abs(a.len - b.len)) AS HUGEINT)
             FROM cells a JOIN cells b
             ON a.g = 1 AND b.g = 1) AS syy,
            (SELECT CAST(sum(cnt) AS BIGINT) FROM cells
             WHERE g = 0) AS n,
            (SELECT CAST(sum(cnt) AS BIGINT) FROM cells
             WHERE g = 1) AS m
    )
    SELECT n AS n_a, m AS n_b,
           CAST(sxy AS BIGINT) AS sum_xy,
           2.0e0 * (CAST(sxy AS DOUBLE)
                    / CAST(CAST(n AS HUGEINT) * m AS DOUBLE))
               - CAST(sxx AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)
               - CAST(syy AS DOUBLE)
                 / CAST(CAST(m AS HUGEINT) * m AS DOUBLE)
               AS e_dist,
           (CAST(CAST(n AS HUGEINT) * m AS DOUBLE)
            / CAST(n + m AS DOUBLE))
               * (2.0e0 * (CAST(sxy AS DOUBLE)
                           / CAST(CAST(n AS HUGEINT) * m
                                  AS DOUBLE))
                  - CAST(sxx AS DOUBLE)
                    / CAST(CAST(n AS HUGEINT) * n AS DOUBLE)
                  - CAST(syy AS DOUBLE)
                    / CAST(CAST(m AS HUGEINT) * m AS DOUBLE))
               AS t_stat
    FROM sums
    """
    return q, sql


def build_wave131_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_chatterjee_xi",) + _chatterjee_query()))
    add(*(("doc_energy_distance",) + _energy_query()))
    return queries, oracles
