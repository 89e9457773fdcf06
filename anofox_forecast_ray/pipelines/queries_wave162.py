"""Wave-162 queries: multiscale entropy, time-lagged MI.

- events_multiscale_entropy: Costa's multiscale sample entropy of
  the hourly count series at scales 1/2/4/8. Coarse-graining uses
  block SUMS (exact integers, not means), the tolerance is the
  integer (IQR // 5) + 1 of the coarse series (exact order stats),
  and the m=2/m=3 template matches are pure integer pair counts —
  the same all-integer SampEn discipline as doc_sample_entropy_w32,
  extended across scales. SampEn = -ln(A/B), one log per scale.
- events_lagged_mi: mutual information between tercile-binned
  total counts at hour t and error counts at hour t+lag, for lags
  0..6 — the "how long does load take to turn into errors"
  diagnostic. Bin edges are exact order statistics, joint cells
  are integers, and the MI folds cells in (bx, by) order with one
  scalar ln per cell.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
MSE_SCALES = [1, 2, 4, 8]
MI_LAGS = 7


# ---------------------------------------------- events_multiscale_entropy
def _mse_query(scales=tuple(MSE_SCALES)):
    def q(sf_dir: str):
        from .queries_wave160 import _hourly

        y = _hourly(sf_dir)
        n = len(y)
        out = {"scale": [], "n_coarse": [], "r_tol": [],
               "b_cnt": [], "a_cnt": [], "sampen": []}
        for s in scales:
            ns = n // s
            z = y[:ns * s].reshape(ns, s).sum(axis=1)
            zs = np.sort(z)
            k25 = (ns + 3) // 4
            k75 = (3 * ns + 3) // 4
            r = (int(zs[k75 - 1]) - int(zs[k25 - 1])) // 5 + 1

            # m=2 / m=3 template pair counts (vectorized)
            d = np.abs(z[:, None] - z[None, :])
            ok = d <= r
            m2 = ok[:-1, :-1] & ok[1:, 1:]
            m3 = m2[:-1, :-1] & ok[2:, 2:]
            iu2 = np.triu_indices(ns - 1, k=1)
            iu3 = np.triu_indices(ns - 2, k=1)
            b = int(m2[iu2].sum())
            a = int(m3[iu3].sum())
            sampen = -math.log(float(a) / float(b))
            out["scale"].append(s)
            out["n_coarse"].append(ns)
            out["r_tol"].append(r)
            out["b_cnt"].append(b)
            out["a_cnt"].append(a)
            out["sampen"].append(sampen)
        return pa.table({
            "scale": pa.array(out["scale"], type=pa.int64()),
            "n_coarse": pa.array(out["n_coarse"],
                                 type=pa.int64()),
            "r_tol": pa.array(out["r_tol"],
                              type=pa.int64()),
            "b_cnt": pa.array(out["b_cnt"],
                              type=pa.int64()),
            "a_cnt": pa.array(out["a_cnt"],
                              type=pa.int64()),
            "sampen": pa.array(out["sampen"],
                               type=pa.float64()),
        })

    size_rows = ", ".join(f"({s})" for s in scales)
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS t,
               COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    scales AS (SELECT * FROM (VALUES {size_rows}) s(sc)),
    coarse AS MATERIALIZED (
        SELECT s.sc, grid.t // s.sc AS i,
               CAST(sum(grid.cnt) AS BIGINT) AS z
        FROM grid CROSS JOIN scales s CROSS JOIN nn
        WHERE grid.t < (nn.n // s.sc) * s.sc
        GROUP BY s.sc, grid.t // s.sc
    ),
    meta AS (
        SELECT sc, CAST(count(*) AS BIGINT) AS ns
        FROM coarse GROUP BY sc
    ),
    tol AS (
        SELECT m.sc,
               ((SELECT z FROM (
                     SELECT z, row_number() OVER (ORDER BY z)
                         AS rk
                     FROM coarse c WHERE c.sc = m.sc)
                 WHERE rk = (3 * m.ns + 3) // 4)
                - (SELECT z FROM (
                     SELECT z, row_number() OVER (ORDER BY z)
                         AS rk
                     FROM coarse c WHERE c.sc = m.sc)
                 WHERE rk = (m.ns + 3) // 4)) // 5 + 1 AS r,
               m.ns
        FROM meta m
    ),
    b2 AS (
        SELECT a.sc, CAST(count(*) AS BIGINT) AS b
        FROM coarse a
        JOIN coarse b_ ON b_.sc = a.sc AND b_.i > a.i
        JOIN coarse a1 ON a1.sc = a.sc AND a1.i = a.i + 1
        JOIN coarse b1 ON b1.sc = a.sc AND b1.i = b_.i + 1
        JOIN tol ON tol.sc = a.sc
        WHERE abs(a.z - b_.z) <= tol.r
          AND abs(a1.z - b1.z) <= tol.r
        GROUP BY a.sc
    ),
    a3 AS (
        SELECT a.sc, CAST(count(*) AS BIGINT) AS a
        FROM coarse a
        JOIN coarse b_ ON b_.sc = a.sc AND b_.i > a.i
        JOIN coarse a1 ON a1.sc = a.sc AND a1.i = a.i + 1
        JOIN coarse b1 ON b1.sc = a.sc AND b1.i = b_.i + 1
        JOIN coarse a2 ON a2.sc = a.sc AND a2.i = a.i + 2
        JOIN coarse b2_ ON b2_.sc = a.sc
                       AND b2_.i = b_.i + 2
        JOIN tol ON tol.sc = a.sc
        WHERE abs(a.z - b_.z) <= tol.r
          AND abs(a1.z - b1.z) <= tol.r
          AND abs(a2.z - b2_.z) <= tol.r
        GROUP BY a.sc
    )
    SELECT CAST(tol.sc AS BIGINT) AS scale,
           tol.ns AS n_coarse,
           CAST(tol.r AS BIGINT) AS r_tol,
           b2.b AS b_cnt,
           a3.a AS a_cnt,
           -ln(CAST(a3.a AS DOUBLE) / CAST(b2.b AS DOUBLE))
               AS sampen
    FROM tol
    JOIN b2 ON b2.sc = tol.sc
    JOIN a3 ON a3.sc = tol.sc
    ORDER BY tol.sc
    """
    return q, sql


# ----------------------------------------------------------- events_lagged_mi
def _lagged_mi_query(lags: int = MI_LAGS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "tot": pa.array([], type=pa.int64()),
                "err": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            hour = tus // US_PER_HOUR
            uh, inv = np.unique(hour, return_inverse=True)
            tot = np.bincount(inv, minlength=uh.size)
            err = np.bincount(inv[et == "error"],
                              minlength=uh.size)
            return pa.table({
                "hour": pa.array(uh.astype(np.int64)),
                "tot": pa.array(tot.astype(np.int64)),
                "err": pa.array(err.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate(
                [("tot", "sum"), ("err", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "tot": g.column("tot_sum").cast(pa.int64()),
                "err": g.column("err_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n = hmax - hmin + 1
        tot = np.zeros(n, dtype=np.int64)
        err = np.zeros(n, dtype=np.int64)
        idx = h["hour"].to_numpy(np.int64) - hmin
        tot[idx] = h["tot"].to_numpy(np.int64)
        err[idx] = h["err"].to_numpy(np.int64)

        def edges(v):
            vs = np.sort(v)
            k1 = (len(v) + 2) // 3
            k2 = (2 * len(v) + 2) // 3
            return int(vs[k1 - 1]), int(vs[k2 - 1])

        tx1, tx2 = edges(tot)
        ty1, ty2 = edges(err)

        def binv(v, e1, e2):
            return np.where(v <= e1, 0,
                            np.where(v <= e2, 1, 2))

        bx = binv(tot, tx1, tx2)
        by = binv(err, ty1, ty2)

        out = {"lag": [], "n_pairs": [], "mi": []}
        for lag in range(lags):
            a = bx[:n - lag]
            b = by[lag:]
            m = len(a)
            joint = np.zeros((3, 3), dtype=np.int64)
            np.add.at(joint, (a, b), 1)
            cx = joint.sum(axis=1)
            cy = joint.sum(axis=0)
            mi = 0.0
            for i in range(3):
                for j in range(3):
                    c = int(joint[i, j])
                    if c > 0:
                        mi = mi + (float(c) / float(m)) \
                            * math.log(
                                (float(m) * float(c))
                                / (float(int(cx[i]))
                                   * float(int(cy[j]))))
            out["lag"].append(lag)
            out["n_pairs"].append(m)
            out["mi"].append(mi)
        return pa.table({
            "lag": pa.array(out["lag"], type=pa.int64()),
            "n_pairs": pa.array(out["n_pairs"],
                                type=pa.int64()),
            "mi": pa.array(out["mi"], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS tot,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS err
        FROM events GROUP BY 1
    ),
    grid AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS t,
               COALESCE(hc.tot, 0) AS tot,
               COALESCE(hc.err, 0) AS err
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    ex AS (
        SELECT
            (SELECT tot FROM (SELECT tot, row_number()
                 OVER (ORDER BY tot) AS rk FROM grid), nn
             WHERE rk = (nn.n + 2) // 3) AS tx1,
            (SELECT tot FROM (SELECT tot, row_number()
                 OVER (ORDER BY tot) AS rk FROM grid), nn
             WHERE rk = (2 * nn.n + 2) // 3) AS tx2,
            (SELECT err FROM (SELECT err, row_number()
                 OVER (ORDER BY err) AS rk FROM grid), nn
             WHERE rk = (nn.n + 2) // 3) AS ty1,
            (SELECT err FROM (SELECT err, row_number()
                 OVER (ORDER BY err) AS rk FROM grid), nn
             WHERE rk = (2 * nn.n + 2) // 3) AS ty2
    ),
    bins AS MATERIALIZED (
        SELECT t,
               CASE WHEN tot <= ex.tx1 THEN 0
                    WHEN tot <= ex.tx2 THEN 1 ELSE 2 END
                   AS bx,
               CASE WHEN err <= ex.ty1 THEN 0
                    WHEN err <= ex.ty2 THEN 1 ELSE 2 END
                   AS by
        FROM grid CROSS JOIN ex
    ),
    lags AS (SELECT unnest(generate_series(0,
                 {lags - 1})) AS lag),
    joint AS (
        SELECT l.lag, a.bx, b.by,
               CAST(count(*) AS BIGINT) AS c
        FROM lags l
        JOIN bins a ON TRUE
        JOIN bins b ON b.t = a.t + l.lag
        GROUP BY 1, 2, 3
    ),
    marg AS (
        SELECT lag,
               CAST(sum(c) AS BIGINT) AS m
        FROM joint GROUP BY lag
    ),
    mx AS (SELECT lag, bx, CAST(sum(c) AS BIGINT) AS cx
           FROM joint GROUP BY lag, bx),
    my AS (SELECT lag, by, CAST(sum(c) AS BIGINT) AS cy
           FROM joint GROUP BY lag, by),
    mi AS (
        SELECT j.lag,
               list_reduce(list_prepend(0.0e0,
                   list((CAST(j.c AS DOUBLE)
                         / CAST(marg.m AS DOUBLE))
                        * ln((CAST(marg.m AS DOUBLE)
                              * CAST(j.c AS DOUBLE))
                             / (CAST(mx.cx AS DOUBLE)
                                * CAST(my.cy AS DOUBLE)))
                        ORDER BY j.bx, j.by)),
                   (x, y) -> x + y) AS mi
        FROM joint j
        JOIN marg ON marg.lag = j.lag
        JOIN mx ON mx.lag = j.lag AND mx.bx = j.bx
        JOIN my ON my.lag = j.lag AND my.by = j.by
        GROUP BY j.lag
    )
    SELECT mi.lag AS lag,
           marg.m AS n_pairs,
           mi.mi AS mi
    FROM mi JOIN marg ON marg.lag = mi.lag
    ORDER BY mi.lag
    """
    return q, sql


def build_wave162_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_multiscale_entropy",) + _mse_query()))
    add(*(("events_lagged_mi",) + _lagged_mi_query()))
    return queries, oracles
