"""Wave-276 query: bipartite co-supplier projection graph.

supplier_copart_graph: the one-mode projection of the supplier×part
bipartite graph from lineitem — two suppliers are linked iff they
ship at least one common part.  Edge weights (number of shared
parts), density, and the heaviest pair are all exact integers from
a distinct-(supplier, part) self-join; the top pair breaks ties at
the lexicographically smallest key pair.  Complements the
events-graph family (components/triangles/modularity) with the
classic market-overlap projection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def copart_graph(pairs):
    """(n_sup, n_edges, density, mean_shared, max_shared,
    top_a, top_b) from distinct (suppkey, partkey) pairs."""
    parts_of = {}
    for s, p in pairs:
        parts_of.setdefault(s, set()).add(p)
    sups = sorted(parts_of)
    n = len(sups)
    edges = 0
    tot_shared = 0
    best = None
    for i in range(n):
        for j in range(i + 1, n):
            w = len(parts_of[sups[i]] & parts_of[sups[j]])
            if w > 0:
                edges += 1
                tot_shared += w
                if best is None or w > best[0]:
                    best = (w, sups[i], sups[j])
    density = float(edges) / float(n * (n - 1) // 2)
    mean_shared = float(tot_shared) / float(edges)
    return (n, edges, density, mean_shared,
            best[0], best[1], best[2])


def _copart_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/lineitem.parquet",
                          columns=["l_suppkey", "l_partkey"])
        sk = t.column("l_suppkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        pk = t.column("l_partkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        key = np.unique(sk * (1 << 32) + pk)
        pairs = [(int(k >> 32), int(k & ((1 << 32) - 1)))
                 for k in key]
        n, e, dens, mean_sh, mx, ta, tb = copart_graph(pairs)
        return pa.table({
            "n_suppliers": pa.array([n], type=pa.int64()),
            "n_edges": pa.array([e], type=pa.int64()),
            "density": pa.array([dens], type=pa.float64()),
            "mean_shared": pa.array([mean_sh],
                                    type=pa.float64()),
            "max_shared": pa.array([mx], type=pa.int64()),
            "top_a": pa.array([ta], type=pa.int64()),
            "top_b": pa.array([tb], type=pa.int64()),
        })

    sql = """
    WITH sp AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        FROM lineitem
    ),
    nn AS (
        SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM sp
    ),
    e AS (
        SELECT a.s AS sa, b.s AS sb,
               CAST(count(*) AS BIGINT) AS w
        FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
        GROUP BY a.s, b.s
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS edges,
               CAST(sum(w) AS BIGINT) AS tot,
               CAST(max(w) AS BIGINT) AS mx
        FROM e
    ),
    top AS (
        SELECT sa, sb FROM e
        ORDER BY w DESC, sa ASC, sb ASC LIMIT 1
    )
    SELECT nn.n AS n_suppliers,
           agg.edges AS n_edges,
           CAST(agg.edges AS DOUBLE)
               / CAST(nn.n * (nn.n - 1) // 2 AS DOUBLE)
               AS density,
           CAST(agg.tot AS DOUBLE) / CAST(agg.edges AS DOUBLE)
               AS mean_shared,
           agg.mx AS max_shared,
           (SELECT CAST(sa AS BIGINT) FROM top) AS top_a,
           (SELECT CAST(sb AS BIGINT) FROM top) AS top_b
    FROM nn CROSS JOIN agg
    """
    return q, sql


def build_wave276_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("supplier_copart_graph",) + _copart_query()))
    return queries, oracles
