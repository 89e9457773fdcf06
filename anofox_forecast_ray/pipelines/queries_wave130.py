"""Wave-130 queries: Jarque-Bera normality, Kendall tau-b.

- events_jarque_bera: Jarque-Bera normality test of the dense
  hourly count series. The mean is one division of exact ints; the
  centered second/third/fourth moments fold in strict hour order
  (Python left folds == DuckDB list_reduce) per the two-pass rule
  (counts have small CV — raw-moment Cramer would cancel); skewness,
  excess kurtosis and JB = n/6 (S^2 + K^2/4) are scalar arithmetic
  spelled identically on both sides.
- lineitem_kendall_tau_b: tie-corrected Kendall tau-b between
  l_quantity and the discount basis points over the bounded 50x11
  contingency grid — concordant/discordant counts come from cell
  PAIRS (never row pairs), so the whole statistic is exact integer
  arithmetic (HUGEINT in the oracle, Python ints in the engine)
  until the final sqrt of the tie-corrected denominator. The engine
  uses 2-D suffix cumsums; the independent verify recomputes C/D
  with a quadratic cell-pair loop.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000


# -------------------------------------------------------- events_jarque_bera
def _jarque_bera_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // US_PER_HOUR
            uh, c = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uh.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate([("cnt", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("hour").reset_index(drop=True)
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n_grid = hmax - hmin + 1
        cnt = np.zeros(n_grid, dtype=np.int64)
        cnt[h["hour"].to_numpy(np.int64) - hmin] = (
            h["cnt"].to_numpy(np.int64))
        y = [int(v) for v in cnt]
        n = len(y)
        sy = sum(y)
        mean = float(sy) / float(n)

        m2 = 0.0
        m3 = 0.0
        m4 = 0.0
        for v in y:
            d = float(v) - mean
            m2 = m2 + d * d
            m3 = m3 + d * d * d
            m4 = m4 + d * d * d * d
        m2 = m2 / float(n)
        m3 = m3 / float(n)
        m4 = m4 / float(n)
        s = m3 / (m2 * math.sqrt(m2))
        k = m4 / (m2 * m2) - 3.0
        jb = (float(n) / 6.0) * (s * s + (k * k) / 4.0)
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "mean_cnt": pa.array([mean], type=pa.float64()),
            "skewness": pa.array([s], type=pa.float64()),
            "excess_kurt": pa.array([k], type=pa.float64()),
            "jb_stat": pa.array([jb], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour, COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    mu AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(cnt AS HUGEINT)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS mean
        FROM grid
    ),
    mom AS (
        SELECT mu.n, mu.mean,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(cnt AS DOUBLE) - mu.mean)
                        * (CAST(cnt AS DOUBLE) - mu.mean)
                        ORDER BY hour)),
                   (x, y) -> x + y) / CAST(mu.n AS DOUBLE)
                   AS m2,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(cnt AS DOUBLE) - mu.mean)
                        * (CAST(cnt AS DOUBLE) - mu.mean)
                        * (CAST(cnt AS DOUBLE) - mu.mean)
                        ORDER BY hour)),
                   (x, y) -> x + y) / CAST(mu.n AS DOUBLE)
                   AS m3,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(cnt AS DOUBLE) - mu.mean)
                        * (CAST(cnt AS DOUBLE) - mu.mean)
                        * (CAST(cnt AS DOUBLE) - mu.mean)
                        * (CAST(cnt AS DOUBLE) - mu.mean)
                        ORDER BY hour)),
                   (x, y) -> x + y) / CAST(mu.n AS DOUBLE)
                   AS m4
        FROM grid CROSS JOIN mu GROUP BY mu.n, mu.mean
    )
    SELECT n AS n_hours,
           mean AS mean_cnt,
           m3 / (m2 * sqrt(m2)) AS skewness,
           m4 / (m2 * m2) - 3.0e0 AS excess_kurt,
           (CAST(n AS DOUBLE) / 6.0e0)
               * ((m3 / (m2 * sqrt(m2)))
                  * (m3 / (m2 * sqrt(m2)))
                  + ((m4 / (m2 * m2) - 3.0e0)
                     * (m4 / (m2 * m2) - 3.0e0)) / 4.0e0)
               AS jb_stat
    FROM mom
    """
    return q, sql


# ---------------------------------------------------- lineitem_kendall_tau_b
def _kendall_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "q": pa.array([], type=pa.int64()),
                "d": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if ("l_quantity" not in t.column_names
                    or t.num_rows == 0):
                return empty
            qty = np.round(t.column("l_quantity").to_numpy(
                zero_copy_only=False)).astype(np.int64)
            bp = np.round(t.column("l_discount").to_numpy(
                zero_copy_only=False) * 10000.0).astype(np.int64)
            key = qty * np.int64(1 << 20) + bp
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "q": pa.array(uk // (1 << 20)),
                "d": pa.array(uk % (1 << 20)),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["q", "d"]).aggregate([("c", "sum")])
            return pa.table({
                "q": g.column("q").cast(pa.int64()),
                "d": g.column("d").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_quantity", "l_discount"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        qs = sorted(int(v) for v in cells["q"].unique())
        ds = sorted(int(v) for v in cells["d"].unique())
        qix = {v: i for i, v in enumerate(qs)}
        dix = {v: j for j, v in enumerate(ds)}
        nq, nd = len(qs), len(ds)
        mat = [[0] * nd for _ in range(nq)]
        for qv, dv, c in zip(cells["q"], cells["d"],
                             cells["c"]):
            mat[qix[int(qv)]][dix[int(dv)]] = int(c)

        # 2-D suffix cumsums with Python ints (exact)
        conc = 0
        disc = 0
        for i in range(nq):
            for j in range(nd):
                cij = mat[i][j]
                if cij == 0:
                    continue
                gg = sum(mat[a][b]
                         for a in range(i + 1, nq)
                         for b in range(j + 1, nd))
                gl = sum(mat[a][b]
                         for a in range(i + 1, nq)
                         for b in range(0, j))
                conc += cij * gg
                disc += cij * gl
        n = sum(sum(row) for row in mat)
        n0 = n * (n - 1) // 2
        n1 = sum(t * (t - 1) // 2
                 for t in (sum(row) for row in mat))
        n2 = sum(t * (t - 1) // 2
                 for t in (sum(mat[i][j] for i in range(nq))
                           for j in range(nd)))
        num = conc - disc
        den = math.sqrt(float(n0 - n1) * float(n0 - n2))
        tau_b = float(num) / den
        return pa.table({
            "n_rows": pa.array([n], type=pa.int64()),
            "concordant": pa.array([conc], type=pa.int64()),
            "discordant": pa.array([disc], type=pa.int64()),
            "ties_q": pa.array([n1], type=pa.int64()),
            "ties_d": pa.array([n2], type=pa.int64()),
            "tau_b": pa.array([tau_b], type=pa.float64()),
        })

    sql = """
    WITH cells AS (
        SELECT CAST(round_even(l_quantity, 0) AS BIGINT) AS q,
               CAST(round_even(l_discount * 10000, 0) AS BIGINT)
                   AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    cd AS (
        SELECT
            CAST(COALESCE(sum(CAST(a.c AS HUGEINT) * b.c)
                 FILTER (WHERE b.q > a.q AND b.d > a.d), 0)
                 AS HUGEINT) AS conc,
            CAST(COALESCE(sum(CAST(a.c AS HUGEINT) * b.c)
                 FILTER (WHERE b.q > a.q AND b.d < a.d), 0)
                 AS HUGEINT) AS disc
        FROM cells a JOIN cells b ON TRUE
    ),
    tots AS (
        SELECT CAST(sum(c) AS HUGEINT) AS n FROM cells
    ),
    tq AS (
        SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1) // 2
                    ) AS HUGEINT) AS n1
        FROM (SELECT sum(c) AS t FROM cells GROUP BY q)
    ),
    td AS (
        SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1) // 2
                    ) AS HUGEINT) AS n2
        FROM (SELECT sum(c) AS t FROM cells GROUP BY d)
    )
    SELECT CAST(tots.n AS BIGINT) AS n_rows,
           CAST(cd.conc AS BIGINT) AS concordant,
           CAST(cd.disc AS BIGINT) AS discordant,
           CAST(tq.n1 AS BIGINT) AS ties_q,
           CAST(td.n2 AS BIGINT) AS ties_d,
           CAST(cd.conc - cd.disc AS DOUBLE)
               / sqrt(CAST(tots.n * (tots.n - 1) // 2 - tq.n1
                           AS DOUBLE)
                      * CAST(tots.n * (tots.n - 1) // 2 - td.n2
                             AS DOUBLE)) AS tau_b
    FROM cd CROSS JOIN tots CROSS JOIN tq CROSS JOIN td
    """
    return q, sql


def build_wave130_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_jarque_bera",) + _jarque_bera_query()))
    add(*(("lineitem_kendall_tau_b",) + _kendall_query()))
    return queries, oracles
