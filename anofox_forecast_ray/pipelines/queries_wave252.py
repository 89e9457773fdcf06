"""Wave-252 queries: variance homogeneity and circular hotspots.

events_cochran_hartley: Cochran's C and Hartley's F_max variance-
homogeneity statistics across the 24 hour-of-day groups of the dense
day×hour event-count lattice.  Group sizes are EQUAL (every day in
the day grid contributes all 24 cells), so the (n−1)·n denominators
cancel and both statistics are ratios of the integer variance cores
v_h = n·Σx² − (Σx)²: C = v_max/Σv, F_max = v_max/v_min — each a
single float division; the reported argmax hour breaks ties at the
smallest h deterministically.

events_getis_ord_ring: the Getis-Ord G* local hotspot z-score on the
24-hour ring with the 3-cell neighborhood (i−1, i, i+1 mod 24,
self-inclusive), over total hour-of-day event counts.  L_i is an
exact integer ring convolution; the z formula (Getis & Ord 1995,
W = S1 = 3) is one identical float expression per row.  The local
companion of the global events_ring_moran_geary row.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def cochran_hartley(cells):
    """(n_days, c_hour, c_stat, fmax) from a (n_days, 24) int grid."""
    n = len(cells)
    vs = []
    for h in range(24):
        sx = sum(row[h] for row in cells)
        sxx = sum(row[h] * row[h] for row in cells)
        vs.append(n * sxx - sx * sx)
    vmax = max(vs)
    c_hour = vs.index(vmax)
    vsum = sum(vs)
    vmin = min(vs)
    c_stat = float(vmax) / float(vsum)
    fmax = None if vmin == 0 else float(vmax) / float(vmin)
    return n, c_hour, c_stat, fmax


def getis_ord_ring(x):
    """[(hod, l3, z)] for the 24-ring, 3-cell self-inclusive hood."""
    n = len(x)
    sx = sum(x)
    sxx = sum(v * v for v in x)
    xb = float(sx) / float(n)
    s = math.sqrt(float(sxx) / float(n) - xb * xb)
    den = s * math.sqrt((float(n) * 3.0 - 9.0) / (float(n) - 1.0))
    out = []
    for i in range(n):
        l3 = x[(i - 1) % n] + x[i] + x[(i + 1) % n]
        z = (float(l3) - xb * 3.0) / den
        out.append((i, l3, z))
    return out


# --------------------------------------------- events_cochran_hartley
def _cochran_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "cell": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            cell = (tus // US_PER_DAY) * 24 + (
                tus // US_PER_HOUR) % 24
            uk, cnt = np.unique(cell, return_counts=True)
            return pa.table({
                "cell": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("cell").aggregate([("cnt", "sum")])
            return pa.table({
                "cell": g.column("cell").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        cells = a["cell"].to_numpy(np.int64)
        cnts = a["cnt"].to_numpy(np.int64)
        d0 = int(cells.min()) // 24
        d1 = int(cells.max()) // 24
        nd = d1 - d0 + 1
        grid = np.zeros((nd, 24), dtype=np.int64)
        grid[cells // 24 - d0, cells % 24] = cnts
        n, c_hour, c_stat, fmax = cochran_hartley(
            [[int(v) for v in row] for row in grid])
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "c_hour": pa.array([c_hour], type=pa.int64()),
            "c_stat": pa.array([c_stat], type=pa.float64()),
            "hartley_fmax": pa.array([fmax], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    lattice AS (
        SELECT d.day, h.hod
        FROM (SELECT CAST(unnest(generate_series(lo, hi))
                          AS BIGINT) AS day FROM span) d
        CROSS JOIN (SELECT CAST(unnest(generate_series(0, 23))
                                AS BIGINT) AS hod) h
    ),
    x AS (
        SELECT l.hod, CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM lattice l LEFT JOIN (
            SELECT day, hod, count(*) AS cnt
            FROM ev GROUP BY day, hod
        ) c ON l.day = c.day AND l.hod = c.hod
    ),
    v AS (
        SELECT hod,
               CAST(count(*) AS BIGINT) * CAST(sum(x * x) AS BIGINT)
               - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT)
                   AS vh,
               CAST(count(*) AS BIGINT) AS n
        FROM x GROUP BY hod
    ),
    agg AS (
        SELECT max(vh) AS vmax, min(vh) AS vmin,
               CAST(sum(vh) AS BIGINT) AS vsum,
               max(n) AS n
        FROM v
    ),
    arg AS (
        SELECT hod FROM v
        WHERE vh = (SELECT vmax FROM agg)
        ORDER BY hod LIMIT 1
    )
    SELECT agg.n AS n_days,
           (SELECT CAST(hod AS BIGINT) FROM arg) AS c_hour,
           CAST(agg.vmax AS DOUBLE) / CAST(agg.vsum AS DOUBLE)
               AS c_stat,
           CASE WHEN agg.vmin = 0 THEN NULL
                ELSE CAST(agg.vmax AS DOUBLE)
                     / CAST(agg.vmin AS DOUBLE) END
               AS hartley_fmax
    FROM agg
    """
    return q, sql


# --------------------------------------------- events_getis_ord_ring
def _getis_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hod": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            cnt = np.bincount(hod, minlength=24)
            return pa.table({
                "hod": pa.array(np.arange(24, dtype=np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hod").aggregate([("cnt", "sum")])
            return pa.table({
                "hod": g.column("hod").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = (tree_reduce_tables(refs, merge).to_pandas()
             .sort_values("hod"))
        x = [int(v) for v in a["cnt"]]
        rows = getis_ord_ring(x)
        return pa.table({
            "hod": pa.array([r[0] for r in rows], type=pa.int64()),
            "local_sum": pa.array([r[1] for r in rows],
                                  type=pa.int64()),
            "gstar_z": pa.array([r[2] for r in rows],
                                type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod
        FROM events
    ),
    grid AS (
        SELECT CAST(unnest(generate_series(0, 23)) AS BIGINT)
                   AS hod
    ),
    x AS (
        SELECT g.hod, CAST(coalesce(c.cnt, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT hod, count(*) AS cnt FROM ev GROUP BY hod
        ) c ON g.hod = c.hod
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM x
    ),
    l AS (
        SELECT a.hod,
               a.x + b.x + c.x AS l3
        FROM x a
        JOIN x b ON b.hod = (a.hod + 23) % 24
        JOIN x c ON c.hod = (a.hod + 1) % 24
    )
    SELECT l.hod,
           l.l3 AS local_sum,
           (CAST(l.l3 AS DOUBLE)
            - CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE) * 3.0)
           / (sqrt(CAST(s.sxx AS DOUBLE) / CAST(s.n AS DOUBLE)
                   - (CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE))
                     * (CAST(s.sx AS DOUBLE) / CAST(s.n AS DOUBLE)))
              * sqrt((CAST(s.n AS DOUBLE) * 3.0 - 9.0)
                     / (CAST(s.n AS DOUBLE) - 1.0))) AS gstar_z
    FROM l CROSS JOIN s
    ORDER BY l.hod
    """
    return q, sql


def build_wave252_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_cochran_hartley",) + _cochran_query()))
    add(*(("events_getis_ord_ring",) + _getis_query()))
    return queries, oracles
