"""Wave-50 queries: bivariate correlation, repeat-purchase cohorts, and
audience overlap.

- lineitem_qty_price_corr: Pearson correlation between quantity and
  extended price over the whole lineitem table — five exact int64
  moment sums (quantity is integral-valued, price in cents) and ONE
  identical f64 expression on both sides. The cross products n*syy
  exceed int64, so the engine combines moments in Python arbitrary-
  precision ints and the oracle in HUGEINT — both convert the same
  exact integer to f64 once. (Envelope: sum of squared cents must fit
  int64 — holds through sf0.1; shift the price origin beyond.)
- orders_cohort_repeat_rate: per first-order-month cohort, how many
  customers ever ordered again — per-customer (first month, n_orders)
  partials collapse in the bucket kernel; cohort cells are bounded.
- events_type_user_jaccard: audience overlap between event types —
  per-user type BITMASK (bounded vocabulary) reduced in the bucket
  kernel, then a 2^5-cell mask histogram from which every pairwise
  |A∩B| / |A∪B| is exact integer arithmetic on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ----------------------------------------------- lineitem_qty_price_corr
def _corr_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "l_quantity" not in t.column_names:
                return pa.table(
                    {"n": pa.array([], type=pa.int64()),
                     "sx": pa.array([], type=pa.int64()),
                     "sy": pa.array([], type=pa.int64()),
                     "sxx": pa.array([], type=pa.int64()),
                     "syy": pa.array([], type=pa.int64()),
                     "sxy": pa.array([], type=pa.int64())}
                )
            x = np.round(
                t.column("l_quantity").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            y = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            return pa.table(
                {"n": pa.array([len(x)], type=pa.int64()),
                 "sx": pa.array([int(x.sum())], type=pa.int64()),
                 "sy": pa.array([int(y.sum())], type=pa.int64()),
                 "sxx": pa.array([int((x * x).sum())],
                                 type=pa.int64()),
                 "syy": pa.array([int((y * y).sum())],
                                 type=pa.int64()),
                 "sxy": pa.array([int((x * y).sum())],
                                 type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            return pa.table(
                {c: pa.array(
                    [int(t.column(c).to_numpy(
                        zero_copy_only=False).sum())],
                    type=pa.int64())
                 for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
            )

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge)
        g = {c: int(a.column(c)[0].as_py())
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        n, sx, sy = g["n"], g["sx"], g["sy"]
        num = n * g["sxy"] - sx * sy
        dx = n * g["sxx"] - sx * sx
        dy = n * g["syy"] - sy * sy
        r = (float(np.float64(num))
             / float(np.sqrt(np.float64(dx) * np.float64(dy))))
        return pa.table(
            {"n": pa.array([n], type=pa.int64()),
             "sxy": pa.array([g["sxy"]], type=pa.int64()),
             "r": pa.array([r], type=pa.float64())}
        )

    sql = """
    WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS sx,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)) AS BIGINT) AS sy,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT)
                        * CAST(round_even(l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS sxx,
               CAST(sum(CAST(round_even(l_extendedprice * 100, 0)
                             AS BIGINT)
                        * CAST(round_even(l_extendedprice * 100, 0)
                               AS BIGINT)) AS BIGINT) AS syy,
               CAST(sum(CAST(round_even(l_quantity, 0) AS BIGINT)
                        * CAST(round_even(l_extendedprice * 100, 0)
                               AS BIGINT)) AS BIGINT) AS sxy
        FROM lineitem
    )
    SELECT n, sxy,
           CAST(CAST(n AS HUGEINT) * sxy
                - CAST(sx AS HUGEINT) * sy AS DOUBLE)
               / sqrt(CAST(CAST(n AS HUGEINT) * sxx
                           - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                      * CAST(CAST(n AS HUGEINT) * syy
                             - CAST(sy AS HUGEINT) * sy AS DOUBLE))
               AS r
    FROM m
    """
    return q, sql


# ----------------------------------------------- orders_cohort_repeat_rate
def _cohort_repeat_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "first_m": pa.array([], type=pa.int64()),
                 "n_orders": pa.array([], type=pa.int64())}
            )
            if "o_custkey" not in t.column_names:
                return empty
            us = t.column("o_orderdate").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            month = (us // 86_400_000_000).astype(
                "datetime64[D]"
            ).astype("datetime64[M]").astype(np.int64)
            df = pa.table(
                {"user_id": t.column("o_custkey").cast(pa.int64()),
                 "m": pa.array(month)}
            ).to_pandas()
            a = (df.groupby("user_id")
                 .agg(first_m=("m", "min"), n_orders=("m", "size"))
                 .reset_index())
            a["n_orders"] = a["n_orders"].astype(np.int64)
            return pa.Table.from_pandas(a, preserve_index=False)

        def cohorts(g: pa.Table) -> pa.Table:
            # two chained int64 hash aggregates, all exact
            a = g.group_by("user_id").aggregate(
                [("first_m", "min"), ("n_orders", "sum")]
            )
            fm = a.column("first_m_min").to_numpy(zero_copy_only=False)
            no = a.column("n_orders_sum").to_numpy(
                zero_copy_only=False
            )
            rep = (no >= 2).astype(np.int64)
            c = pa.table(
                {"first_m": pa.array(fm, type=pa.int64()),
                 "one": pa.array(np.ones(fm.size, dtype=np.int64)),
                 "repeat": pa.array(rep)}
            ).group_by("first_m").aggregate(
                [("one", "sum"), ("repeat", "sum")]
            )
            return pa.table(
                {"first_m": c.column("first_m").cast(pa.int64()),
                 "n_customers": c.column("one_sum").cast(pa.int64()),
                 "n_repeat": c.column("repeat_sum").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("first_m").aggregate(
                [("n_customers", "sum"), ("n_repeat", "sum")]
            )
            return pa.table(
                {"first_m": g.column("first_m"),
                 "n_customers":
                     g.column("n_customers_sum").cast(pa.int64()),
                 "n_repeat":
                     g.column("n_repeat_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "orders", ["o_custkey", "o_orderdate"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(cohorts, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "first_m"
        )
        m0 = int(a["first_m"].min())
        nc = a["n_customers"].to_numpy(np.int64)
        nr = a["n_repeat"].to_numpy(np.int64)
        return pa.table(
            {"cohort_month": pa.array(
                a["first_m"].to_numpy(np.int64) - m0),
             "n_customers": pa.array(nc),
             "n_repeat": pa.array(nr),
             "repeat_rate": pa.array(
                 nr.astype(np.float64) / nc.astype(np.float64),
                 type=pa.float64())}
        )

    sql = """
    WITH o AS (
        SELECT o_custkey,
               date_part('year', o_orderdate) * 12
                   + date_part('month', o_orderdate) - 1 AS m
        FROM orders
    ),
    u AS (
        SELECT o_custkey, min(m) AS first_m,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM o GROUP BY o_custkey
    ),
    m0 AS (SELECT min(first_m) AS m0 FROM u)
    SELECT CAST(u.first_m - m0.m0 AS BIGINT) AS cohort_month,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN u.n_orders >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_repeat,
           CAST(sum(CASE WHEN u.n_orders >= 2 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS repeat_rate
    FROM u, m0 GROUP BY u.first_m - m0.m0
    """
    return q, sql


# --------------------------------------------- events_type_user_jaccard
def _type_jaccard_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        code = {t: i for i, t in enumerate(EVENT_TYPES)}

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"user_id": pa.array([], type=pa.int64()),
                 "mask": pa.array([], type=pa.int64())}
            )
            if "user_id" not in t.column_names:
                return empty
            u = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            et = np.asarray(t.column("event_type").to_pylist())
            bits = np.fromiter(
                (1 << code[x] for x in et), dtype=np.int64,
                count=len(et),
            )
            uu, inv = np.unique(u, return_inverse=True)
            masks = np.zeros(uu.size, dtype=np.int64)
            np.bitwise_or.at(masks, inv, bits)
            return pa.table(
                {"user_id": pa.array(uu), "mask": pa.array(masks)}
            )

        def mask_hist(g: pa.Table) -> pa.Table:
            # per-user OR-fold via sort + a segmented bitwise_or.reduceat
            u = g.column("user_id").to_numpy(zero_copy_only=False)
            m = g.column("mask").to_numpy(zero_copy_only=False)
            order = np.argsort(u, kind="stable")
            u_s, m_s = u[order], m[order]
            starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
            per_user = np.bitwise_or.reduceat(m_s, starts)
            um, uc = np.unique(per_user, return_counts=True)
            return pa.table(
                {"mask": pa.array(um, type=pa.int64()),
                 "n_users": pa.array(uc.astype(np.int64),
                                     type=pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("mask").aggregate([("n_users", "sum")])
            return pa.table(
                {"mask": g.column("mask"),
                 "n_users": g.column("n_users_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(mask_hist, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        masks = h["mask"].to_numpy(np.int64)
        counts = h["n_users"].to_numpy(np.int64)
        rows = {"type_a": [], "type_b": [], "n_both": [],
                "n_either": [], "jaccard": []}
        for i, a in enumerate(EVENT_TYPES):
            for b in EVENT_TYPES[i + 1:]:
                ba, bb = 1 << code[a], 1 << code[b]
                both = int(counts[
                    (masks & ba > 0) & (masks & bb > 0)].sum())
                either = int(counts[
                    (masks & ba > 0) | (masks & bb > 0)].sum())
                if both == 0:
                    continue  # oracle's inner join omits such pairs
                rows["type_a"].append(a)
                rows["type_b"].append(b)
                rows["n_both"].append(both)
                rows["n_either"].append(either)
                rows["jaccard"].append(
                    float(np.float64(both) / np.float64(either))
                    if either else 0.0
                )
        return pa.table(
            {"type_a": pa.array(rows["type_a"], type=pa.string()),
             "type_b": pa.array(rows["type_b"], type=pa.string()),
             "n_both": pa.array(rows["n_both"], type=pa.int64()),
             "n_either": pa.array(rows["n_either"],
                                  type=pa.int64()),
             "jaccard": pa.array(rows["jaccard"],
                                 type=pa.float64())}
        )

    sql = """
    WITH tu AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    ),
    sizes AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM tu
        GROUP BY event_type
    )
    SELECT p.type_a, p.type_b, p.n_both,
           sa.n + sb.n - p.n_both AS n_either,
           CAST(p.n_both AS DOUBLE)
               / CAST(sa.n + sb.n - p.n_both AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.event_type = p.type_a
    JOIN sizes sb ON sb.event_type = p.type_b
    """
    return q, sql


def build_wave50_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_qty_price_corr",) + _corr_query()))
    add(*(("orders_cohort_repeat_rate",) + _cohort_repeat_query()))
    add(*(("events_type_user_jaccard",) + _type_jaccard_query()))
    return queries, oracles
