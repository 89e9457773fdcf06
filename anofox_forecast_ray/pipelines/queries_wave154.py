"""Wave-154 queries: triangle counting, degree assortativity.

Both run on the thresholded user co-activity graph: vertices are
users, an (unweighted) edge joins two users whose hourly
co-activity weight is STRICTLY above the exact 75th-percentile
weight (ceil(0.75 m)-th smallest — integer order stat), which keeps
the graph sparse and non-degenerate at every scale.

- events_graph_triangles: exact triangle count + global clustering
  (transitivity = 3T / open-or-closed wedges). The engine
  intersects sorted adjacency lists per edge; the oracle triple-
  joins the canonical a<b edge table. Wedges = sum over vertices
  of C(deg, 2), all integers.
- events_graph_assortativity: Newman's degree assortativity — the
  Pearson correlation of (deg_a, deg_b) over both orientations of
  every edge, computed from exact integer moments with the
  symmetric closed form r = (M1*Sxy - Sx^2) / (M1*Sxx - Sx^2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


def _edges(sf_dir: str):
    """Thresholded co-activity edge list (ua < ub), plus counts."""
    import pandas as pd
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def prep(t: pa.Table) -> pa.Table:
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = t.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = tus // US_PER_HOUR
        key = hour * np.int64(1 << 20) + uid
        uk = np.unique(key)
        return pa.table({
            "hour": pa.array(uk // (1 << 20)),
            "uid": pa.array(uk % (1 << 20)),
        })

    def pairs(g: pa.Table) -> pa.Table:
        us = np.unique(
            g.column("uid").to_numpy(zero_copy_only=False)
        )
        if us.size < 2:
            return pa.table({
                "ua": pa.array([], type=pa.int64()),
                "ub": pa.array([], type=pa.int64()),
                "w": pa.array([], type=pa.int64()),
            })
        ii, jj = np.triu_indices(us.size, k=1)
        return pa.table({
            "ua": pa.array(us[ii]),
            "ub": pa.array(us[jj]),
            "w": pa.array(np.ones(ii.size, dtype=np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by(["ua", "ub"]).aggregate([("w", "sum")])
        return pa.table({
            "ua": g.column("ua").cast(pa.int64()),
            "ub": g.column("ub").cast(pa.int64()),
            "w": g.column("w_sum").cast(pa.int64()),
        })

    refs = list(
        read_cols(sf_dir, "events", ["ts", "user_id"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("hour")
        .map_groups(pairs, batch_format="pyarrow")
        .to_arrow_refs()
    )
    ed = tree_reduce_tables(refs, merge).to_pandas()
    w = np.sort(ed["w"].to_numpy(np.int64))
    m = len(w)
    k = (3 * m + 3) // 4  # ceil(0.75 m)
    thr = int(w[k - 1])
    keep = ed[ed["w"] > thr].sort_values(
        ["ua", "ub"]).reset_index(drop=True)
    return keep, m, thr


EDGE_SQL = f"""
    inc AS (
        SELECT DISTINCT epoch_us(ts) // {US_PER_HOUR} AS hour,
               user_id AS uid
        FROM events
    ),
    wedges_all AS (
        SELECT a.uid AS ua, b.uid AS ub,
               CAST(count(*) AS BIGINT) AS w
        FROM inc a JOIN inc b
          ON b.hour = a.hour AND b.uid > a.uid
        GROUP BY 1, 2
    ),
    thr AS (
        SELECT w AS t FROM (
            SELECT w, row_number() OVER (ORDER BY w) AS r
            FROM wedges_all),
            (SELECT CAST(count(*) AS BIGINT) AS m
             FROM wedges_all) mm
        WHERE r = (3 * mm.m + 3) // 4
    ),
    edges AS (
        SELECT ua, ub FROM wedges_all CROSS JOIN thr
        WHERE w > thr.t
    )
"""


# ---------------------------------------------------- events_graph_triangles
def _triangle_query():
    def q(sf_dir: str):
        ed, m_all, thr = _edges(sf_dir)
        adj = {}
        for a, b in zip(ed["ua"], ed["ub"]):
            adj.setdefault(int(a), set()).add(int(b))
            adj.setdefault(int(b), set()).add(int(a))
        tri = 0
        for a, b in zip(ed["ua"], ed["ub"]):
            tri += len(adj[int(a)] & adj[int(b)])
        tri //= 3
        wedges = sum(len(s) * (len(s) - 1) // 2
                     for s in adj.values())
        trans = (3.0 * float(tri)) / float(wedges)
        return pa.table({
            "n_edges": pa.array([len(ed)], type=pa.int64()),
            "w_thr": pa.array([thr], type=pa.int64()),
            "triangles": pa.array([tri], type=pa.int64()),
            "wedges": pa.array([wedges], type=pa.int64()),
            "transitivity": pa.array([trans],
                                     type=pa.float64()),
        })

    sql = f"""
    WITH {EDGE_SQL},
    tri AS (
        SELECT CAST(count(*) AS BIGINT) AS t
        FROM edges e1
        JOIN edges e2 ON e2.ua = e1.ua AND e2.ub > e1.ub
        JOIN edges e3 ON e3.ua = e1.ub AND e3.ub = e2.ub
    ),
    degs AS (
        SELECT uid, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT ua AS uid FROM edges
              UNION ALL SELECT ub FROM edges)
        GROUP BY uid
    ),
    wd AS (
        SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w
        FROM degs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges)
               AS n_edges,
           (SELECT t FROM thr) AS w_thr,
           tri.t AS triangles,
           wd.w AS wedges,
           3.0e0 * CAST(tri.t AS DOUBLE)
               / CAST(wd.w AS DOUBLE) AS transitivity
    FROM tri CROSS JOIN wd
    """
    return q, sql


# ----------------------------------------------- events_graph_assortativity
def _assortativity_query():
    def q(sf_dir: str):
        ed, _m, thr = _edges(sf_dir)
        deg = {}
        for a, b in zip(ed["ua"], ed["ub"]):
            deg[int(a)] = deg.get(int(a), 0) + 1
            deg[int(b)] = deg.get(int(b), 0) + 1
        m1 = 2 * len(ed)  # both orientations
        sx = 0
        sxx = 0
        sxy = 0
        for a, b in zip(ed["ua"], ed["ub"]):
            da = deg[int(a)]
            db = deg[int(b)]
            sx += da + db
            sxx += da * da + db * db
            sxy += 2 * da * db
        num = m1 * sxy - sx * sx
        den = m1 * sxx - sx * sx
        r = float(num) / float(den)
        return pa.table({
            "n_edges": pa.array([len(ed)], type=pa.int64()),
            "assortativity": pa.array([r],
                                      type=pa.float64()),
        })

    sql = f"""
    WITH {EDGE_SQL},
    degs AS (
        SELECT uid, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT ua AS uid FROM edges
              UNION ALL SELECT ub FROM edges)
        GROUP BY uid
    ),
    ornt AS (
        SELECT da.d AS x, db.d AS y
        FROM edges e
        JOIN degs da ON da.uid = e.ua
        JOIN degs db ON db.uid = e.ub
        UNION ALL
        SELECT db.d, da.d
        FROM edges e
        JOIN degs da ON da.uid = e.ua
        JOIN degs db ON db.uid = e.ub
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS m1,
               CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS sxx,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                   AS sxy
        FROM ornt
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM edges)
               AS n_edges,
           CAST(m1 * sxy - sx * sx AS DOUBLE)
               / CAST(m1 * sxx - sx * sx AS DOUBLE)
               AS assortativity
    FROM mom
    """
    return q, sql


def build_wave154_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_graph_triangles",) + _triangle_query()))
    add(*(("events_graph_assortativity",)
          + _assortativity_query()))
    return queries, oracles
