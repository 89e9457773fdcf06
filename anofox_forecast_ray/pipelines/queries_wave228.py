"""Wave-228 queries: Somers' D / GK gamma, uncertainty coefficient.

- events_somers_gamma: the ordinal-association pair between
  hour-of-day (0..23) and the VALUE TERCILE (bands split at the
  exact integer order statistics of rank ceil(n/3), ceil(2n/3)):
  from the bounded 24x3 contingency, concordant/discordant pair
  counts C and D and the y-ties T_y are pure int64 cross sums, so
  Goodman-Kruskal gamma = (C-D)/(C+D) and Somers'
  D(y|x) = (C-D)/(C+D+T_y) are each one division.
- events_uncertainty_coeff: Theil's uncertainty coefficient
  U(type|hour) = I(hour; type)/H(type) over the 24x5 cell counts —
  the NORMALIZED "how much does knowing the hour tell you about
  the event type" (one ln per occupied cell + per margin, folds in
  cell order).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


def somers_gamma(cells):
    """cells: {(x, y): n} ordinal levels. Returns
    (C, D, Ty, gamma, somers_d)."""
    ks = sorted(cells)
    C = 0
    D = 0
    for i, (x1, y1) in enumerate(ks):
        n1 = cells[(x1, y1)]
        for (x2, y2) in ks[i + 1:]:
            n2 = cells[(x2, y2)]
            if x2 > x1 and y2 > y1:
                C += n1 * n2
            elif x2 > x1 and y2 < y1:
                D += n1 * n2
            elif x2 == x1:
                continue
    # y-ties with different x
    ty = 0
    for i, (x1, y1) in enumerate(ks):
        for (x2, y2) in ks[i + 1:]:
            if y2 == y1 and x2 != x1:
                ty += cells[(x1, y1)] * cells[(x2, y2)]
    gamma = (C - D) / (C + D)
    dd = (C - D) / (C + D + ty)
    return C, D, ty, gamma, dd


def uncertainty_coeff(cells):
    """cells: {(x, y): n}. U(y|x) = I/H(y); folds in cell order."""
    n = sum(cells.values())
    import collections

    mx = collections.Counter()
    my = collections.Counter()
    for (x, y), c in cells.items():
        mx[x] += c
        my[y] += c
    mi = 0.0
    for (x, y) in sorted(cells):
        c = cells[(x, y)]
        mi = mi + (c / n) * math.log((c * n) / (mx[x] * my[y]))
    hy = 0.0
    for y in sorted(my):
        hy = hy - (my[y] / n) * math.log(my[y] / n)
    return mi, hy, mi / hy


def _hour_cells(sf_dir: str, col_fn, columns):
    import pandas as pd
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        h, y = col_fn(t)
        df = pd.DataFrame({"x": h, "y": y})
        g = df.groupby(["x", "y"]).size().reset_index(name="n")
        return pa.table({
            "x": pa.array(g["x"].astype("int64")),
            "y": pa.array(g["y"].astype("int64")),
            "n": pa.array(g["n"].astype("int64")),
        })

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby(["x", "y"])["n"].sum().reset_index()
        return pa.table({
            "x": pa.array(g["x"].astype("int64")),
            "y": pa.array(g["y"].astype("int64")),
            "n": pa.array(g["n"].astype("int64")),
        })

    refs = list(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=columns,
            override_num_blocks=_num_read_blocks(),
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    )
    t = tree_reduce_tables(refs, merge).to_pandas()
    return {(int(r["x"]), int(r["y"])): int(r["n"])
            for _, r in t.iterrows()}


# ------------------------------------------------ events_somers_gamma
def _somers_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        # exact tercile cutoffs from the full (bounded) histogram
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def hist_partial(t: pa.Table) -> pa.Table:
            cents = np.round(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            uk, c = np.unique(cents, return_counts=True)
            return pa.table({"v": pa.array(uk),
                             "c": pa.array(c.astype(np.int64))})

        def hist_merge(t: pa.Table) -> pa.Table:
            g = t.group_by("v").aggregate([("c", "sum")])
            return pa.table({
                "v": g.column("v").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["value"])
            .map_batches(hist_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, hist_merge).to_pandas()
        h = h.sort_values("v").reset_index(drop=True)
        n = int(h["c"].sum())
        cum = np.cumsum(h["c"].to_numpy(np.int64))
        r1 = (n + 2) // 3   # ceil(n/3)
        r2 = (2 * n + 2) // 3
        q1 = int(h["v"].to_numpy(np.int64)[
            np.searchsorted(cum, r1)])
        q2 = int(h["v"].to_numpy(np.int64)[
            np.searchsorted(cum, r2)])

        def cols(t: pa.Table):
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            cents = np.round(t.column("value").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            band = np.where(cents < q1, 0,
                            np.where(cents < q2, 1, 2))
            return hod, band

        cells = _hour_cells(sf_dir, cols, ["ts", "value"])
        C, D, ty, gamma, dd = somers_gamma(cells)
        return pa.table({
            "n_concordant": pa.array([C], type=pa.int64()),
            "n_discordant": pa.array([D], type=pa.int64()),
            "gk_gamma": pa.array([gamma], type=pa.float64()),
            "somers_d": pa.array([dd], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS h,
               CAST(round_even(value * 100, 0) AS BIGINT) AS c
        FROM events
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
    qs AS (
        SELECT
            (SELECT c FROM (SELECT c, row_number()
                 OVER (ORDER BY c) AS r FROM e)
             WHERE r = ((SELECT n FROM nn) + 2) // 3) AS q1,
            (SELECT c FROM (SELECT c, row_number()
                 OVER (ORDER BY c) AS r FROM e)
             WHERE r = (2 * (SELECT n FROM nn) + 2) // 3) AS q2
        FROM (SELECT 1)
    ),
    banded AS (
        SELECT h AS x,
               CASE WHEN c < (SELECT q1 FROM qs) THEN 0
                    WHEN c < (SELECT q2 FROM qs) THEN 1
                    ELSE 2 END AS y
        FROM e
    ),
    cells AS (
        SELECT x, y, CAST(count(*) AS BIGINT) AS n
        FROM banded GROUP BY x, y
    ),
    pairs AS (
        SELECT
            CAST(sum(CASE WHEN b.x > a.x AND b.y > a.y
                     THEN a.n * b.n ELSE 0 END) AS BIGINT)
                AS c_cnt,
            CAST(sum(CASE WHEN b.x > a.x AND b.y < a.y
                     THEN a.n * b.n ELSE 0 END) AS BIGINT)
                AS d_cnt,
            CAST(sum(CASE WHEN b.y = a.y AND b.x <> a.x
                     THEN a.n * b.n ELSE 0 END) AS BIGINT)
                AS ty
        FROM cells a JOIN cells b
            ON (b.x > a.x) OR (b.x = a.x AND b.y > a.y)
    )
    SELECT c_cnt AS n_concordant, d_cnt AS n_discordant,
           CAST(c_cnt - d_cnt AS DOUBLE)
               / CAST(c_cnt + d_cnt AS DOUBLE) AS gk_gamma,
           CAST(c_cnt - d_cnt AS DOUBLE)
               / CAST(c_cnt + d_cnt + ty AS DOUBLE) AS somers_d
    FROM pairs
    """
    return q, sql


# ------------------------------------------- events_uncertainty_coeff
def _uc_query():
    def q(sf_dir: str):
        def cols(t: pa.Table):
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            et = np.asarray(t.column("event_type").to_pylist())
            order = ["click", "error", "purchase", "signup",
                     "view"]
            code = np.array([order.index(x) for x in et],
                            dtype=np.int64)
            return hod, code

        cells = _hour_cells(sf_dir, cols, ["ts", "event_type"])
        mi, hy, u = uncertainty_coeff(cells)
        return pa.table({
            "mi_nats": pa.array([mi], type=pa.float64()),
            "h_type": pa.array([hy], type=pa.float64()),
            "uncertainty_u": pa.array([u], type=pa.float64()),
        })

    type_case = ("CASE event_type WHEN 'click' THEN 0 "
                 "WHEN 'error' THEN 1 WHEN 'purchase' THEN 2 "
                 "WHEN 'signup' THEN 3 ELSE 4 END")
    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS x,
               {type_case} AS y
        FROM events
    ),
    cells AS (
        SELECT x, y, CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY x, y
    ),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM cells),
    mif AS (
        SELECT list_reduce(list_prepend(0.0e0,
            list((CAST(n AS DOUBLE)
                  / CAST((SELECT n FROM nn) AS DOUBLE))
                 * ln(CAST(n * (SELECT n FROM nn) AS DOUBLE)
                      / CAST((SELECT sum(c2.n) FROM cells c2
                              WHERE c2.x = cells.x)
                             * (SELECT sum(c2.n) FROM cells c2
                                WHERE c2.y = cells.y)
                             AS DOUBLE))
                 ORDER BY x, y)), (a, v) -> a + v) AS mi
        FROM cells
    ),
    ymarg AS (
        SELECT y, CAST(sum(n) AS BIGINT) AS m
        FROM cells GROUP BY y
    ),
    hyf AS (
        SELECT -list_reduce(list_prepend(0.0e0,
            list((CAST(m AS DOUBLE)
                  / CAST((SELECT n FROM nn) AS DOUBLE))
                 * ln(CAST(m AS DOUBLE)
                      / CAST((SELECT n FROM nn) AS DOUBLE))
                 ORDER BY y)), (a, v) -> a + v) AS hy
        FROM ymarg
    )
    SELECT mif.mi AS mi_nats, hyf.hy AS h_type,
           mif.mi / hyf.hy AS uncertainty_u
    FROM mif CROSS JOIN hyf
    """
    return q, sql


def build_wave228_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_somers_gamma",) + _somers_query()))
    add(*(("events_uncertainty_coeff",) + _uc_query()))
    return queries, oracles
