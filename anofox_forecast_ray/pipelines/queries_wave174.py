"""Wave-174 queries: Shapley channel attribution, revenue deciles.

- events_shapley_attribution: the 5-player Shapley value over the
  coalition function v(S) = conversion rate of user-days whose
  PRE-purchase channel set is exactly S — the principled
  marketing-attribution method (extends the 2-feature Shapley R2
  of wave 140 to the full set-function form). Channel sets are
  5-bit masks (bounded 32 cells of integer counts); v is one
  division per subset; the Shapley weights |S|! (k-|S|-1)! / k!
  are exact rationals folded per channel in subset-mask order.
  Efficiency check: sum phi = v(full) - v(empty).
- customer_revenue_deciles: the Lorenz-curve table — customers
  ranked by total revenue (desc, key tiebreak), exact ceil(d n/10)
  decile boundaries, integer revenue share numerators and one
  division per decile.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
CHANNELS = ["click", "error", "signup", "view"]  # purchase = conversion


# ----------------------------------------------- events_shapley_attribution
def _shapley_attr_query():
    k = len(CHANNELS)

    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "user_id": t.column("user_id"),
                "day": pa.array(
                    (tus // US_PER_DAY).astype(np.int64)),
                "tus": pa.array(tus),
                "event_type": t.column("event_type"),
            })

        def masks(g: pd.DataFrame) -> pa.Table:
            import collections
            cells = collections.Counter()
            for (_u, _d), grp in g.groupby(
                    ["user_id", "day"], sort=False):
                pur = grp.loc[grp["event_type"]
                              == "purchase", "tus"]
                cut = int(pur.min()) if len(pur) else None
                conv = 1 if cut is not None else 0
                mask = 0
                for i, ch in enumerate(CHANNELS):
                    sub = grp[grp["event_type"] == ch]
                    if cut is not None:
                        sub = sub[sub["tus"] < cut]
                    if len(sub):
                        mask |= 1 << i
                cells[(mask, conv)] += 1
            keys = sorted(cells)
            return pa.table({
                "mask": pa.array([x[0] for x in keys],
                                 type=pa.int64()),
                "conv": pa.array([x[1] for x in keys],
                                 type=pa.int64()),
                "c": pa.array([cells[x] for x in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["mask", "conv"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "mask": g.column("mask").cast(pa.int64()),
                "conv": g.column("conv").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket,
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(masks, batch_format="pandas")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        n_tab = {}
        c_tab = {}
        for _, r in cells.iterrows():
            m = int(r["mask"])
            n_tab[m] = n_tab.get(m, 0) + int(r["c"])
            if int(r["conv"]) == 1:
                c_tab[m] = c_tab.get(m, 0) + int(r["c"])

        def v(m):
            n = n_tab.get(m, 0)
            if n == 0:
                return 0.0
            return float(c_tab.get(m, 0)) / float(n)

        phis = []
        for i in range(k):
            phi = 0.0
            for s in range(1 << k):
                if s & (1 << i):
                    continue
                sz = bin(s).count("1")
                w = (math.factorial(sz)
                     * math.factorial(k - sz - 1)) \
                    / float(math.factorial(k))
                phi = phi + w * (v(s | (1 << i)) - v(s))
            phis.append(phi)
        return pa.table({
            "channel": pa.array(CHANNELS,
                                type=pa.string()),
            "phi": pa.array(phis, type=pa.float64()),
        })

    # SQL: weights per subset size, spelled as exact literals
    wlits = {sz: (math.factorial(sz)
                  * math.factorial(k - sz - 1))
             / float(math.factorial(k))
             for sz in range(k)}
    wcase = " ".join(
        f"WHEN {sz} THEN {wlits[sz]!r}"
        for sz in range(k))
    sql = f"""
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) // {US_PER_DAY} AS day,
               epoch_us(ts) AS tus,
               event_type
        FROM events
    ),
    cut AS (
        SELECT user_id, day,
               min(CASE WHEN event_type = 'purchase'
                   THEN tus END) AS cut
        FROM e GROUP BY user_id, day
    ),
    sess AS (
        SELECT e.user_id, e.day,
               CAST(max(CASE WHEN cut.cut IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS conv,
               CAST(COALESCE(max(CASE WHEN event_type
                        = 'click' AND (cut.cut IS NULL
                        OR tus < cut.cut)
                        THEN 1 ELSE 0 END), 0)
                    + 2 * COALESCE(max(CASE WHEN event_type
                        = 'error' AND (cut.cut IS NULL
                        OR tus < cut.cut)
                        THEN 1 ELSE 0 END), 0)
                    + 4 * COALESCE(max(CASE WHEN event_type
                        = 'signup' AND (cut.cut IS NULL
                        OR tus < cut.cut)
                        THEN 1 ELSE 0 END), 0)
                    + 8 * COALESCE(max(CASE WHEN event_type
                        = 'view' AND (cut.cut IS NULL
                        OR tus < cut.cut)
                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS mask
        FROM e JOIN cut ON cut.user_id = e.user_id
                       AND cut.day = e.day
        GROUP BY e.user_id, e.day
    ),
    vt AS (
        SELECT mask,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) AS BIGINT) AS c
        FROM sess GROUP BY mask
    ),
    subsets AS (
        SELECT unnest(generate_series(0, {(1 << k) - 1}))
            AS s
    ),
    chans AS (
        SELECT i.i,
               CASE i.i WHEN 0 THEN 'click'
                        WHEN 1 THEN 'error'
                        WHEN 2 THEN 'signup'
                        ELSE 'view' END AS channel
        FROM (SELECT unnest(generate_series(0, {k - 1}))
                  AS i) i
    ),
    terms AS (
        SELECT ch.i, ch.channel, sub.s,
               bit_count(CAST(sub.s AS BIGINT)) AS sz,
               COALESCE((SELECT CAST(c AS DOUBLE)
                             / CAST(n AS DOUBLE)
                         FROM vt WHERE mask =
                             sub.s + (1 << ch.i)), 0.0e0)
               - COALESCE((SELECT CAST(c AS DOUBLE)
                               / CAST(n AS DOUBLE)
                           FROM vt WHERE mask = sub.s),
                          0.0e0) AS dv
        FROM chans ch JOIN subsets sub
          ON (sub.s & (1 << ch.i)) = 0
    ),
    phi AS (
        SELECT channel,
               list_reduce(list_prepend(0.0e0,
                   list((CASE sz {wcase} ELSE 0.0e0 END)
                        * dv ORDER BY s)),
                   (x, y) -> x + y) AS phi
        FROM terms GROUP BY channel
    )
    SELECT channel, phi
    FROM phi ORDER BY channel
    """
    return q, sql


# -------------------------------------------------- customer_revenue_deciles
def _deciles_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "ckey": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
            })
            if "o_custkey" not in t.column_names:
                return empty
            ckey = t.column("o_custkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.round(
                t.column("o_totalprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            uk, inv = np.unique(ckey, return_inverse=True)
            cs = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "ckey": pa.array(uk),
                "cents": pa.array(cs),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("ckey").aggregate(
                [("cents", "sum")])
            return pa.table({
                "ckey": g.column("ckey").cast(pa.int64()),
                "cents": g.column("cents_sum").cast(
                    pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        per = tree_reduce_tables(refs, merge).to_pandas()
        rows = sorted(zip(per["cents"], per["ckey"]),
                      key=lambda r: (-int(r[0]), int(r[1])))
        n = len(rows)
        tot = sum(int(c) for c, _k in rows)

        out = {"decile": [], "n_cust": [], "rev": [],
               "share": []}
        prev = 0
        for d in range(1, 11):
            cut = (d * n + 9) // 10
            rev = sum(int(c) for c, _k in rows[prev:cut])
            out["decile"].append(d)
            out["n_cust"].append(cut - prev)
            out["rev"].append(rev)
            out["share"].append(float(rev) / float(tot))
            prev = cut
        return pa.table({
            "decile": pa.array(out["decile"],
                               type=pa.int64()),
            "n_cust": pa.array(out["n_cust"],
                               type=pa.int64()),
            "rev_cents": pa.array(out["rev"],
                                  type=pa.int64()),
            "share": pa.array(out["share"],
                              type=pa.float64()),
        })

    sql = """
    WITH per AS (
        SELECT o_custkey AS ckey,
               CAST(sum(CAST(round_even(o_totalprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ),
    rk AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents DESC,
                                  ckey ASC) AS r
        FROM per
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(cents) AS BIGINT) AS tot
           FROM per),
    dec AS (
        SELECT d.d,
               ((d.d - 1) * nn.n + 9) // 10 AS lo,
               (d.d * nn.n + 9) // 10 AS hi
        FROM (SELECT unnest(generate_series(1, 10)) AS d) d
        CROSS JOIN nn
    )
    SELECT CAST(dec.d AS BIGINT) AS decile,
           CAST(dec.hi - dec.lo AS BIGINT) AS n_cust,
           CAST((SELECT COALESCE(sum(cents), 0) FROM rk
                 WHERE r > dec.lo AND r <= dec.hi)
                AS BIGINT) AS rev_cents,
           CAST((SELECT COALESCE(sum(cents), 0) FROM rk
                 WHERE r > dec.lo AND r <= dec.hi)
                AS DOUBLE) / CAST(nn.tot AS DOUBLE)
               AS share
    FROM dec CROSS JOIN nn
    ORDER BY dec.d
    """
    return q, sql


def build_wave174_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_shapley_attribution",)
          + _shapley_attr_query()))
    add(*(("customer_revenue_deciles",) + _deciles_query()))
    return queries, oracles
