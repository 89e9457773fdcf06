"""Wave-203 queries: CUSUMSQ stability test, KDE mode.

- orders_cusumsq: the Brown-Durbin-Evans CUSUM-of-SQUARES test for
  VARIANCE stability of the monthly revenue trend, built directly
  on the wave-200 recursive residuals: S_r = sum_{t<=r} w_t^2 /
  sum w_t^2 should track the line (r-2)/(T-2) under stability;
  emits the max absolute deviation and where it occurs (argmax by
  deviation DESC, r ASC over identically-computed doubles).
- part_retail_kde: Gaussian kernel density estimation of the part
  retail price (rounded dollars; bounded histogram): density on a
  fixed 64-point grid with bandwidth h = range/16, one scalar exp
  per (grid, distinct value) pair, and the KDE MODE via argmax
  (density DESC, grid ASC). The classic nonparametric density
  sibling of the Nadaraya-Watson regression (wave 137).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

KDE_GRID = 64


def cusumsq(ws):
    """(t_count, max_dev, argmax_r) over recursive residuals in
    order; S_r = cum w^2 / total w^2 vs the null line."""
    T = len(ws)
    tot = 0.0
    for w in ws:
        tot = tot + w * w
    cum = 0.0
    best = None
    for i, w in enumerate(ws):
        cum = cum + w * w
        s = cum / tot
        line = (i + 1) / T
        dev = abs(s - line)
        key = (dev, -(i + 1))
        if best is None or key > best[0]:
            best = (key, i + 1, dev)
    return T, best[2], best[1]


def kde_grid(values, counts, lo: int, hi: int):
    """(grid, density) Gaussian KDE over the histogram; folds over
    distinct values in ascending order per grid point."""
    n = int(sum(counts))
    h = (hi - lo) / 16.0e0
    const = 1.0e0 / (n * h * math.sqrt(2.0e0 * math.pi))
    out_g = []
    out_d = []
    for i in range(KDE_GRID):
        g = lo + i * (hi - lo) / (KDE_GRID - 1.0e0)
        s = 0.0
        for v, c in zip(values, counts):
            u = (g - v) / h
            s = s + c * math.exp(-0.5e0 * (u * u))
        out_g.append(g)
        out_d.append(const * s)
    return out_g, out_d


# ---------------------------------------------------- orders_cusumsq
def _cusumsq_query():
    def q(sf_dir: str):
        # recompute the wave-200 recursive residual path
        from .queries_wave200 import _recresid_query

        inner, _ = _recresid_query()
        path = inner(sf_dir).to_pandas().sort_values("r")
        ws = [float(v) for v in path["w_resid"]]
        T, max_dev, arg_r = cusumsq(ws)
        return pa.table({
            "n_resid": pa.array([T], type=pa.int64()),
            "max_dev": pa.array([max_dev], type=pa.float64()),
            "argmax_idx": pa.array([arg_r], type=pa.int64()),
        })

    from .queries_wave200 import _recresid_query

    _, rec_sql = _recresid_query()
    sql = f"""
    WITH path AS ({rec_sql}),
    idx AS (
        SELECT w_resid,
               row_number() OVER (ORDER BY r) AS i,
               CAST(count(*) OVER () AS BIGINT) AS t
        FROM path
    ),
    tot AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(w_resid * w_resid ORDER BY i)),
                   (p, v) -> p + v) AS s
        FROM idx
    ),
    devs AS (
        SELECT i, t,
               abs((SELECT list_reduce(list_prepend(0.0e0,
                        list(i2.w_resid * i2.w_resid
                             ORDER BY i2.i)), (p, v) -> p + v)
                    FROM idx i2 WHERE i2.i <= idx.i)
                   / (SELECT s FROM tot)
                   - CAST(i AS DOUBLE) / CAST(t AS DOUBLE))
                   AS dev
        FROM idx
    ),
    pick AS (
        SELECT i, t, dev,
               row_number() OVER (ORDER BY dev DESC, i ASC)
                   AS rk
        FROM devs
    )
    SELECT t AS n_resid, dev AS max_dev,
           CAST(i AS BIGINT) AS argmax_idx
    FROM pick WHERE rk = 1
    """
    return q, sql


# --------------------------------------------------- part_retail_kde
def _kde_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            d = np.round(t.column("p_retailprice").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            uk, c = np.unique(d, return_counts=True)
            return pa.table({
                "v": pa.array(uk),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("v").aggregate([("c", "sum")])
            return pa.table({
                "v": g.column("v").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "part", ["p_retailprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        hh = tree_reduce_tables(refs, merge).to_pandas()
        hh = hh.sort_values("v").reset_index(drop=True)
        vals = [int(v) for v in hh["v"]]
        cnts = [int(v) for v in hh["c"]]
        lo, hi = vals[0], vals[-1]
        grid, dens = kde_grid(vals, cnts, lo, hi)
        best = None
        for g, d in zip(grid, dens):
            key = (d, -g)
            if best is None or key > best[0]:
                best = (key, g, d)
        return pa.table({
            "kde_mode": pa.array([best[1]], type=pa.float64()),
            "density_at_mode": pa.array([best[2]],
                                        type=pa.float64()),
        })

    sql = f"""
    WITH h AS (
        SELECT CAST(round_even(p_retailprice, 0) AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS c
        FROM part GROUP BY 1
    ),
    span AS (
        SELECT CAST(min(v) AS BIGINT) AS lo,
               CAST(max(v) AS BIGINT) AS hi,
               CAST(sum(c) AS BIGINT) AS n
        FROM h
    ),
    grid AS (
        SELECT CAST(unnest(generate_series(0, {KDE_GRID - 1}))
                    AS BIGINT) AS i
    ),
    dens AS (
        SELECT g.i,
               CAST((SELECT lo FROM span) AS DOUBLE)
               + CAST(g.i AS DOUBLE)
                 * CAST((SELECT hi FROM span)
                        - (SELECT lo FROM span) AS DOUBLE)
                 / {KDE_GRID - 1}.0e0 AS gx,
               (1.0e0 / (CAST((SELECT n FROM span) AS DOUBLE)
                 * (CAST((SELECT hi FROM span)
                         - (SELECT lo FROM span) AS DOUBLE)
                    / 16.0e0)
                 * sqrt(2.0e0 * pi())))
               * (SELECT list_reduce(list_prepend(0.0e0,
                      list(CAST(h.c AS DOUBLE)
                           * exp(-0.5e0
                               * (((CAST((SELECT lo FROM span)
                                         AS DOUBLE)
                                    + CAST(g.i AS DOUBLE)
                                      * CAST((SELECT hi
                                              FROM span)
                                        - (SELECT lo FROM span)
                                        AS DOUBLE)
                                      / {KDE_GRID - 1}.0e0)
                                   - CAST(h.v AS DOUBLE))
                                  / (CAST((SELECT hi FROM span)
                                     - (SELECT lo FROM span)
                                     AS DOUBLE) / 16.0e0))
                                 * (((CAST((SELECT lo FROM span)
                                           AS DOUBLE)
                                      + CAST(g.i AS DOUBLE)
                                        * CAST((SELECT hi
                                                FROM span)
                                          - (SELECT lo
                                             FROM span)
                                          AS DOUBLE)
                                        / {KDE_GRID - 1}.0e0)
                                     - CAST(h.v AS DOUBLE))
                                    / (CAST((SELECT hi
                                             FROM span)
                                       - (SELECT lo FROM span)
                                       AS DOUBLE) / 16.0e0)))
                           ORDER BY h.v)), (p, x) -> p + x)
                  FROM h) AS d
        FROM grid g
    ),
    pick AS (
        SELECT gx, d,
               row_number() OVER (ORDER BY d DESC, gx ASC) AS rk
        FROM dens
    )
    SELECT gx AS kde_mode, d AS density_at_mode
    FROM pick WHERE rk = 1
    """
    return q, sql


def build_wave203_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("orders_cusumsq",) + _cusumsq_query()))
    add(*(("part_retail_kde",) + _kde_query()))
    return queries, oracles
