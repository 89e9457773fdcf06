"""Wave-264 queries: block-entropy profile and Theil decomposition.

events_block_entropy: Shannon entropy of overlapping k-grams
(k = 1..4) of the daily error up-move chain, with the conditional
entropy-rate increments h_k = H_k − H_{k−1}.  k-gram counts are
exact integers; each H_k is a sequential −p·ln p fold in gram
(lexicographic) order.  Declining h_k exposes the chain's memory —
the binary-chain companion of the Markov entropy-rate rows.

lineitem_theil_decomp_nation: the Theil-T inequality index of
per-supplier revenue (exact cents) decomposed by supplier nation:
T = T_between + Σ_g w_g·T_g with w_g = S_g/X.  Every log argument is
a ratio of exact integers (n·x/X, n_g·x/S_g, n·S_g/(n_g·X)); the
three folds run in (suppkey), (nation, suppkey) and (nation) order
respectively.  The decomposition identity closes to float precision
and is asserted in the verify harness.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


def block_entropy(s: str, kmax: int = 4):
    """[(k, H_k, h_k)] — ordered -p ln p folds per k."""
    out = []
    prev = 0.0
    for k in range(1, kmax + 1):
        grams = {}
        for i in range(len(s) - k + 1):
            g = s[i:i + k]
            grams[g] = grams.get(g, 0) + 1
        m = len(s) - k + 1
        fm = float(m)
        h = 0.0
        for g in sorted(grams):
            p = float(grams[g]) / fm
            h = h + (-(p * math.log(p)))
        out.append((k, h, h - prev))
        prev = h
    return out


def theil_decomp(rows):
    """(n, T, T_between, T_within) from id-ordered
    (nation, suppkey, cents) rows."""
    n = len(rows)
    x_tot = sum(c for _, _, c in rows)
    # total Theil: fold in suppkey order
    t = 0.0
    for _, _, c in sorted(rows, key=lambda r: r[1]):
        if c:
            t = t + ((float(c) / float(x_tot))
                     * math.log(float(n * c) / float(x_tot)))
    groups = {}
    for nat, sk, c in rows:
        groups.setdefault(nat, []).append((sk, c))
    t_within = 0.0
    t_between = 0.0
    for nat in sorted(groups):
        g = sorted(groups[nat])
        n_g = len(g)
        s_g = sum(c for _, c in g)
        tg = 0.0
        for _, c in g:
            if c:
                tg = tg + ((float(c) / float(s_g))
                           * math.log(float(n_g * c)
                                      / float(s_g)))
        t_within = t_within + (float(s_g) / float(x_tot)) * tg
        t_between = t_between + (
            (float(s_g) / float(x_tot))
            * math.log(float(n * s_g) / float(n_g * x_tot)))
    return n, t, t_between, t_within


# ---------------------------------------------- events_block_entropy
def _block_entropy_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        y = [int(v) for v in e]
        s = "".join("1" if b > a else "0"
                    for a, b in zip(y[:-1], y[1:]))
        rows = block_entropy(s)
        return pa.table({
            "k": pa.array([r[0] for r in rows], type=pa.int64()),
            "block_h": pa.array([r[1] for r in rows],
                                type=pa.float64()),
            "cond_h": pa.array([r[2] for r in rows],
                               type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    moves AS (
        SELECT day,
               CASE WHEN y > lag(y) OVER (ORDER BY day)
                    THEN '1' ELSE '0' END AS b,
               lag(y) OVER (ORDER BY day) AS prev
        FROM d
    ),
    str AS (
        SELECT string_agg(b, '' ORDER BY day) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM moves WHERE prev IS NOT NULL
    ),
    ks AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS k),
    grams AS (
        SELECT ks.k,
               substr((SELECT s FROM str), CAST(i AS INT),
                      CAST(ks.k AS INT)) AS g
        FROM ks CROSS JOIN (
            SELECT CAST(unnest(generate_series(1,
                (SELECT CAST(n AS INT) FROM str))) AS BIGINT) AS i
        ) pos
        WHERE pos.i + ks.k - 1 <= (SELECT n FROM str)
    ),
    hist AS (
        SELECT k, g, CAST(count(*) AS BIGINT) AS c
        FROM grams GROUP BY k, g
    ),
    ms AS (
        SELECT k, CAST(sum(c) AS BIGINT) AS m FROM hist
        GROUP BY k
    ),
    hk AS (
        SELECT h.k,
               list_reduce(list_prepend(0.0e0,
                   list(-(CAST(h.c AS DOUBLE)
                          / CAST(ms.m AS DOUBLE)
                          * ln(CAST(h.c AS DOUBLE)
                               / CAST(ms.m AS DOUBLE)))
                        ORDER BY h.g)),
                   (a, b) -> a + b) AS bh
        FROM hist h JOIN ms ON h.k = ms.k
        GROUP BY h.k
    )
    SELECT k, bh AS block_h,
           bh - coalesce(lag(bh) OVER (ORDER BY k), 0.0e0)
               AS cond_h
    FROM hk
    ORDER BY k
    """
    return q, sql


# -------------------------------------- lineitem_theil_decomp_nation
def _theil_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables
        import pyarrow.parquet as pq

        sup = pq.read_table(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"])
        nat = dict(zip(
            [int(v) for v in sup.column("s_suppkey").to_pylist()],
            [int(v) for v in
             sup.column("s_nationkey").to_pylist()]))

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "sk": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "l_suppkey" not in t.column_names:
                return empty
            sk = t.column("l_suppkey").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            uk, inv = np.unique(sk, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "sk": pa.array(uk),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("sk").aggregate([("cents", "sum")])
            return pa.table({
                "sk": g.column("sk").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        per = tree_reduce_tables(refs, merge).to_pandas()
        rows = [(nat[int(r.sk)], int(r.sk), int(r.cents))
                for r in per.itertuples()]
        n, t, tb, tw = theil_decomp(rows)
        return pa.table({
            "n_suppliers": pa.array([n], type=pa.int64()),
            "theil_total": pa.array([t], type=pa.float64()),
            "theil_between": pa.array([tb], type=pa.float64()),
            "theil_within": pa.array([tw], type=pa.float64()),
        })

    sql = """
    WITH per AS (
        SELECT l_suppkey AS sk,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS x
        FROM lineitem GROUP BY 1
    ),
    withnat AS (
        SELECT s.s_nationkey AS nat, per.sk, per.x
        FROM per JOIN supplier s ON s.s_suppkey = per.sk
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS xt
        FROM withnat
    ),
    tt AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list(CASE WHEN x = 0 THEN 0.0e0
                 ELSE (CAST(x AS DOUBLE) / CAST(nn.xt AS DOUBLE))
                      * ln(CAST(nn.n * x AS DOUBLE)
                           / CAST(nn.xt AS DOUBLE)) END
                 ORDER BY sk)),
            (a, b) -> a + b) AS t
        FROM withnat CROSS JOIN nn
        GROUP BY nn.n, nn.xt
    ),
    gr AS (
        SELECT nat,
               CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(x) AS BIGINT) AS sg
        FROM withnat GROUP BY nat
    ),
    tg AS (
        SELECT w.nat,
               list_reduce(list_prepend(0.0e0,
                   list(CASE WHEN w.x = 0 THEN 0.0e0
                        ELSE (CAST(w.x AS DOUBLE)
                              / CAST(gr.sg AS DOUBLE))
                             * ln(CAST(gr.ng * w.x AS DOUBLE)
                                  / CAST(gr.sg AS DOUBLE)) END
                        ORDER BY w.sk)),
                   (a, b) -> a + b) AS tgv
        FROM withnat w JOIN gr ON w.nat = gr.nat
        GROUP BY w.nat
    ),
    folds AS (
        SELECT
            (SELECT list_reduce(list_prepend(0.0e0,
                 list((CAST(gr.sg AS DOUBLE)
                       / CAST(nn.xt AS DOUBLE)) * tg.tgv
                      ORDER BY gr.nat)), (a, b) -> a + b)
             FROM gr JOIN tg ON gr.nat = tg.nat
             CROSS JOIN nn) AS tw,
            (SELECT list_reduce(list_prepend(0.0e0,
                 list((CAST(gr.sg AS DOUBLE)
                       / CAST(nn.xt AS DOUBLE))
                      * ln(CAST(nn.n * gr.sg AS DOUBLE)
                           / CAST(gr.ng * nn.xt AS DOUBLE))
                      ORDER BY gr.nat)), (a, b) -> a + b)
             FROM gr CROSS JOIN nn) AS tb
    )
    SELECT nn.n AS n_suppliers,
           tt.t AS theil_total,
           folds.tb AS theil_between,
           folds.tw AS theil_within
    FROM nn CROSS JOIN tt CROSS JOIN folds
    """
    return q, sql


def build_wave264_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_block_entropy",) + _block_entropy_query()))
    add(*(("lineitem_theil_decomp_nation",) + _theil_query()))
    return queries, oracles
