"""Wave-155 queries: label-propagation components, duplicate invoices.

- events_graph_components: connected components of the
  p75-thresholded co-activity graph by MIN-LABEL PROPAGATION with a
  FIXED 8 rounds — the distributed-join formulation (each round is
  one edge join + min-aggregate, unrolled as 8 CTE layers in the
  oracle exactly like the engine's 8 vectorized sweeps). The result
  reports the component count, the largest component size, and a
  convergence flag (round 8 == round 7), which is true here because
  the graph's diameter is far below 8.
- orders_duplicate_invoices: the classic fraud/ops rule join —
  pairs of orders by the SAME customer in the SAME $10k price band
  (cents // 1e6; exact-cents matching is degenerate here — prices
  are nearly unique) within 7 days of each other. The self-join is
  bounded per customer; the output counts suspect pairs and the
  distinct orders involved (13 pairs at sf0.01 — non-degenerate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave154 import EDGE_SQL, _edges

LP_ROUNDS = 8
DUP_WINDOW_DAYS = 7
US_PER_DAY = 86_400_000_000


# ------------------------------------------------- events_graph_components
def _components_query(rounds: int = LP_ROUNDS):
    def q(sf_dir: str):
        ed, _m, _thr = _edges(sf_dir)
        ua = ed["ua"].to_numpy(np.int64)
        ub = ed["ub"].to_numpy(np.int64)
        nodes = np.unique(np.concatenate([ua, ub]))
        lab = {int(v): int(v) for v in nodes}
        prev = None
        for _r in range(rounds):
            prev = dict(lab)
            new = dict(prev)
            for a, b in zip(ua.tolist(), ub.tolist()):
                la = prev[a]
                lb = prev[b]
                m = la if la < lb else lb
                if m < new[a]:
                    new[a] = m
                if m < new[b]:
                    new[b] = m
            lab = new
        import collections
        sizes = collections.Counter(lab.values())
        n_comp = len(sizes)
        largest = max(sizes.values())
        converged = 1 if lab == prev else 0
        return pa.table({
            "n_nodes": pa.array([len(nodes)],
                                type=pa.int64()),
            "n_components": pa.array([n_comp],
                                     type=pa.int64()),
            "largest": pa.array([largest], type=pa.int64()),
            "converged": pa.array([converged],
                                  type=pa.int64()),
        })

    # unrolled label-propagation CTE layers
    layers = []
    prev = "lab0"
    for r in range(1, rounds + 1):
        layers.append(f"""
    lab{r} AS MATERIALIZED (
        SELECT n.uid,
               LEAST(n.lab, COALESCE(mn.m, n.lab)) AS lab
        FROM {prev} n
        LEFT JOIN (
            SELECT uid, min(lab) AS m FROM (
                SELECT e.ua AS uid, l.lab
                FROM edges e JOIN {prev} l ON l.uid = e.ub
                UNION ALL
                SELECT e.ub AS uid, l.lab
                FROM edges e JOIN {prev} l ON l.uid = e.ua
            ) GROUP BY uid
        ) mn ON mn.uid = n.uid
    )""")
        prev = f"lab{r}"
    layers_sql = ",".join(layers)

    # MATERIALIZED stops DuckDB re-scanning the parquet once per
    # unrolled layer (file-handle exhaustion otherwise)
    edge_sql_mat = (
        EDGE_SQL
        .replace("inc AS (", "inc AS MATERIALIZED (")
        .replace("wedges_all AS (",
                 "wedges_all AS MATERIALIZED (")
        .replace("edges AS (", "edges AS MATERIALIZED ("))
    sql = f"""
    WITH {edge_sql_mat},
    nodes AS (
        SELECT DISTINCT uid FROM (
            SELECT ua AS uid FROM edges
            UNION ALL SELECT ub FROM edges)
    ),
    lab0 AS (SELECT uid, uid AS lab FROM nodes),{layers_sql},
    sizes AS (
        SELECT lab, CAST(count(*) AS BIGINT) AS sz
        FROM lab{rounds} GROUP BY lab
    ),
    conv AS (
        SELECT CAST(CASE WHEN NOT EXISTS (
                   SELECT 1 FROM lab{rounds} a
                   JOIN lab{rounds - 1} b ON b.uid = a.uid
                   WHERE a.lab <> b.lab)
               THEN 1 ELSE 0 END AS BIGINT) AS c
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes)
               AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM sizes)
               AS n_components,
           (SELECT CAST(max(sz) AS BIGINT) FROM sizes)
               AS largest,
           conv.c AS converged
    FROM conv
    """
    return q, sql


# ---------------------------------------------- orders_duplicate_invoices
def _dup_invoice_query(window: int = DUP_WINDOW_DAYS):
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "ckey": pa.array([], type=pa.int64()),
                "okey": pa.array([], type=pa.int64()),
                "cents": pa.array([], type=pa.int64()),
                "day": pa.array([], type=pa.int64()),
            })
            if "o_orderkey" not in t.column_names:
                return empty
            return pa.table({
                "ckey": t.column("o_custkey").cast(pa.int64()),
                "okey": t.column("o_orderkey").cast(
                    pa.int64()),
                "cents": pa.array(np.round(
                    t.column("o_totalprice").to_numpy(
                        zero_copy_only=False) * 100.0
                ).astype(np.int64) // 1_000_000),
                "day": pa.array(
                    (t.column("o_orderdate").cast(pa.int64())
                     .to_numpy(zero_copy_only=False)
                     // US_PER_DAY).astype(np.int64)),
            })

        def per_cust(g: pd.DataFrame) -> pa.Table:
            import collections
            pairs = 0
            orders = set()
            by_cents = collections.defaultdict(list)
            for okey, cents, day in zip(g["okey"], g["cents"],
                                        g["day"]):
                by_cents[int(cents)].append(
                    (int(day), int(okey)))
            for cents, rows in by_cents.items():
                rows.sort()
                for i in range(len(rows)):
                    for j in range(i + 1, len(rows)):
                        if rows[j][0] - rows[i][0] <= window:
                            pairs += 1
                            orders.add(rows[i][1])
                            orders.add(rows[j][1])
            return pa.table({
                "pairs": pa.array([pairs], type=pa.int64()),
                "orders": pa.array([len(orders)],
                                   type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "pairs": pa.array(
                    [pc.sum(t.column("pairs")).as_py()],
                    type=pa.int64()),
                "orders": pa.array(
                    [pc.sum(t.column("orders")).as_py()],
                    type=pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderkey", "o_custkey",
                         "o_totalprice", "o_orderdate"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("ckey")
            .map_groups(per_cust, batch_format="pandas")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        return pa.table({
            "suspect_pairs": pa.array(
                [int(a["pairs"].iloc[0])], type=pa.int64()),
            "orders_involved": pa.array(
                [int(a["orders"].iloc[0])],
                type=pa.int64()),
        })

    sql = f"""
    WITH o AS (
        SELECT o_orderkey AS okey, o_custkey AS ckey,
               CAST(round_even(o_totalprice * 100, 0)
                    AS BIGINT) // 1000000 AS cents,
               epoch_us(o_orderdate) // {US_PER_DAY} AS day
        FROM orders
    ),
    pr AS (
        SELECT a.okey AS oa, b.okey AS ob
        FROM o a JOIN o b
          ON b.ckey = a.ckey AND b.cents = a.cents
         AND b.okey > a.okey
         AND abs(b.day - a.day) <= {window}
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM pr)
               AS suspect_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM (
               SELECT DISTINCT okey FROM (
                   SELECT oa AS okey FROM pr
                   UNION ALL SELECT ob FROM pr)))
               AS orders_involved
    FROM (SELECT 1)
    """
    return q, sql


def build_wave155_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_graph_components",) + _components_query()))
    add(*(("orders_duplicate_invoices",)
          + _dup_invoice_query()))
    return queries, oracles
