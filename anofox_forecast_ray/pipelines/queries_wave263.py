"""Wave-263 query: Kulldorff rectangular scan statistic.

events_kulldorff_scan: the Kulldorff (1997) Poisson scan statistic
over the day×hour event lattice — the rectangle (day range × hour
range) maximizing the log-likelihood ratio
LLR = c·ln(c/μ) + (C−c)·ln((C−c)/(C−μ)) against the uniform
baseline μ = C·|R|/cells, scored only for hot windows (c > μ).
Rectangle sums come from an exact integer 2-D prefix table (four
corners); the LLR is one identical float expression per rectangle
and the argmax iterates (d1, d2, h1, h2) ascending on both sides, so
the selected window is bitwise deterministic.  The space-time
generalization of events_scan_statistic.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def kulldorff_scan(grid):
    """(d1, d2, h1, h2, c, llr) — best rectangle of an int lattice."""
    nd = len(grid)
    nh = len(grid[0])
    pref = np.zeros((nd + 1, nh + 1), dtype=np.int64)
    pref[1:, 1:] = np.cumsum(np.cumsum(
        np.asarray(grid, dtype=np.int64), axis=0), axis=1)
    tot = int(pref[nd, nh])
    cells = nd * nh
    ftot = float(tot)
    best = None
    for d1 in range(nd):
        for d2 in range(d1, nd):
            for h1 in range(nh):
                for h2 in range(h1, nh):
                    c = int(pref[d2 + 1, h2 + 1]
                            - pref[d1, h2 + 1]
                            - pref[d2 + 1, h1]
                            + pref[d1, h1])
                    area = (d2 - d1 + 1) * (h2 - h1 + 1)
                    if area == cells:
                        continue
                    mu = float(tot * area) / float(cells)
                    if float(c) <= mu or c == tot:
                        continue
                    llr = (float(c) * math.log(float(c) / mu)
                           + (ftot - float(c))
                           * math.log((ftot - float(c))
                                      / (ftot - mu)))
                    if best is None or llr > best[0]:
                        best = (llr, d1, d2, h1, h2, c)
    llr, d1, d2, h1, h2, c = best
    return d1, d2, h1, h2, c, llr


def _kulldorff_query():
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
            cell = ((tus // US_PER_DAY) * 24
                    + (tus // US_PER_HOUR) % 24)
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
        nd = int(cells.max()) // 24 - d0 + 1
        grid = np.zeros((nd, 24), dtype=np.int64)
        grid[cells // 24 - d0, cells % 24] = cnts
        d1, d2, h1, h2, c, llr = kulldorff_scan(grid.tolist())
        return pa.table({
            "d1": pa.array([d1], type=pa.int64()),
            "d2": pa.array([d2], type=pa.int64()),
            "h1": pa.array([h1], type=pa.int64()),
            "h2": pa.array([h2], type=pa.int64()),
            "count_in": pa.array([c], type=pa.int64()),
            "llr": pa.array([llr], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               (epoch_us(ts) // {US_PER_HOUR}) % 24 AS hod
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    dims AS (
        SELECT CAST(hi - lo + 1 AS BIGINT) AS nd,
               CAST(24 AS BIGINT) AS nh
        FROM span
    ),
    cells AS (
        SELECT day - (SELECT lo FROM span) AS di, hod AS hi_,
               CAST(count(*) AS BIGINT) AS cnt
        FROM ev GROUP BY day, hod
    ),
    nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM cells),
    dgrid AS (
        SELECT CAST(unnest(generate_series(0,
            (SELECT CAST(nd AS INT) FROM dims))) AS BIGINT) AS dd
    ),
    hgrid AS (
        SELECT CAST(unnest(generate_series(0, 24)) AS BIGINT)
                   AS hh
    ),
    pref AS (
        SELECT d.dd, h.hh,
               (SELECT CAST(coalesce(sum(c.cnt), 0) AS BIGINT)
                FROM cells c
                WHERE c.di < d.dd AND c.hi_ < h.hh) AS p
        FROM dgrid d CROSS JOIN hgrid h
    ),
    rects AS (
        SELECT a.dd AS d1, b.dd AS d2, x.hh AS h1, y.hh AS h2
        FROM dgrid a JOIN dgrid b
          ON a.dd <= b.dd AND b.dd < (SELECT nd FROM dims)
        CROSS JOIN hgrid x JOIN hgrid y
          ON x.hh <= y.hh AND y.hh < 24
    ),
    scored AS (
        SELECT r.d1, r.d2, r.h1, r.h2,
               p22.p - p12.p - p21.p + p11.p AS c,
               (r.d2 - r.d1 + 1) * (r.h2 - r.h1 + 1) AS area
        FROM rects r
        JOIN pref p22 ON p22.dd = r.d2 + 1 AND p22.hh = r.h2 + 1
        JOIN pref p12 ON p12.dd = r.d1 AND p12.hh = r.h2 + 1
        JOIN pref p21 ON p21.dd = r.d2 + 1 AND p21.hh = r.h1
        JOIN pref p11 ON p11.dd = r.d1 AND p11.hh = r.h1
    ),
    llrs AS (
        SELECT d1, d2, h1, h2, c,
               CAST(c AS DOUBLE)
               * ln(CAST(c AS DOUBLE)
                    / (CAST(nn.tot * area AS DOUBLE)
                       / CAST(dims.nd * dims.nh AS DOUBLE)))
               + (CAST(nn.tot AS DOUBLE) - CAST(c AS DOUBLE))
                 * ln((CAST(nn.tot AS DOUBLE)
                       - CAST(c AS DOUBLE))
                      / (CAST(nn.tot AS DOUBLE)
                         - CAST(nn.tot * area AS DOUBLE)
                           / CAST(dims.nd * dims.nh AS DOUBLE)))
                   AS llr
        FROM scored CROSS JOIN nn CROSS JOIN dims
        WHERE area < dims.nd * dims.nh
          AND CAST(c AS DOUBLE) > CAST(nn.tot * area AS DOUBLE)
                                  / CAST(dims.nd * dims.nh
                                         AS DOUBLE)
          AND c < nn.tot
    )
    SELECT d1, d2, h1, h2, c AS count_in, llr
    FROM llrs
    ORDER BY llr DESC, d1 ASC, d2 ASC, h1 ASC, h2 ASC
    LIMIT 1
    """
    return q, sql


def build_wave263_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_kulldorff_scan",) + _kulldorff_query()))
    return queries, oracles
