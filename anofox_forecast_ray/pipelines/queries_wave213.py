"""Wave-213 queries: Poincare SD1/SD2, extremal index.

- doc_poincare_sd: the Poincare-plot descriptors used in HRV
  analysis, over each doc's w8 token-window SUM series: SD1^2 =
  var(successive differences)/2 (short-term variability), SD2^2 =
  2 var(x) - SD1^2 (long-term). Both variances are the explicit
  ddof-1 moment formulas over exact int64 sums/diffs; emits
  (doc_id, sd1, sd2, sd_ratio).
- events_extremal_index: the runs estimator of the extremal index
  theta = #clusters / #exceedances of the hourly count series over
  the integer P90 threshold (rank ceil(0.9 n)), where a new
  cluster starts when at least r = 2 consecutive hours stayed at
  or below the threshold — pure integer counts, one division;
  theta near 1 = isolated spikes, small theta = clustered extremes.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import SQL_TOK, _num_read_blocks
from .queries_wave137 import _hourly_counts

RUNS_R = 2


def poincare_sd(s):
    """(sd1, sd2) from the int series; explicit moments."""
    n = len(s)
    s1 = 0
    s2 = 0
    for v in s:
        s1 += int(v)
        s2 += int(v) * int(v)
    varx = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
    d = [int(s[i]) - int(s[i - 1]) for i in range(1, n)]
    m = len(d)
    d1 = 0
    d2 = 0
    for v in d:
        d1 += v
        d2 += v * v
    vard = (float(d2) - float(d1) * float(d1) / m) / (m - 1)
    sd1 = math.sqrt(vard / 2.0e0)
    sd2sq = 2.0e0 * varx - vard / 2.0e0
    sd2 = math.sqrt(sd2sq)
    return sd1, sd2


def extremal_index(x, r: int = RUNS_R):
    """(u, n_exc, n_clusters, theta) runs estimator."""
    xs = sorted(int(v) for v in x)
    n = len(xs)
    rk = (9 * n + 9) // 10
    u = xs[rk - 1]
    n_exc = 0
    n_clu = 0
    gap = r  # start "far" so first exceedance opens a cluster
    for v in x:
        if int(v) > u:
            n_exc += 1
            if gap >= r:
                n_clu += 1
            gap = 0
        else:
            gap += 1
    theta = n_clu / n_exc
    return u, n_exc, n_clu, theta


# ------------------------------------------------------ doc_poincare_sd
def _poincare_query(width: int = 8):
    def q(sf_dir: str):
        from .queries import _cast, corpus_ds

        def fn(t: pa.Table) -> pa.Table:
            toks = t.column("tokens")
            dids = t.column("doc_id").to_pylist()
            out = {"doc_id": [], "sd1": [], "sd2": [],
                   "sd_ratio": []}
            for i in range(len(dids)):
                arr = np.asarray(toks[i].as_py(), dtype=np.int64)
                if arr.size == 0:
                    continue
                nw = (arr.size + width - 1) // width
                if nw < 4:
                    continue
                bounds = np.arange(0, arr.size, width)
                s = [int(v) for v in np.add.reduceat(arr, bounds)]
                sd1, sd2 = poincare_sd(s)
                out["doc_id"].append(dids[i])
                out["sd1"].append(sd1)
                out["sd2"].append(sd2)
                out["sd_ratio"].append(sd1 / sd2)
            return pa.table({
                "doc_id": pa.array(out["doc_id"],
                                   type=pa.string()),
                "sd1": pa.array(out["sd1"], type=pa.float64()),
                "sd2": pa.array(out["sd2"], type=pa.float64()),
                "sd_ratio": pa.array(out["sd_ratio"],
                                     type=pa.float64()),
            })

        ds = corpus_ds(sf_dir).map_batches(
            fn, batch_format="pyarrow")
        return _cast(ds, {"doc_id": pa.string(),
                          "sd1": pa.float64(),
                          "sd2": pa.float64(),
                          "sd_ratio": pa.float64()})

    sql = f"""
    WITH tok AS ({SQL_TOK}),
    w AS (
        SELECT doc_id, pos // {width} AS wid,
               CAST(sum(token) AS BIGINT) AS s
        FROM tok GROUP BY doc_id, wid
    ),
    f AS (
        SELECT doc_id, wid, s,
               lag(s) OVER (PARTITION BY doc_id ORDER BY wid)
                   AS prev
        FROM w
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(s) AS BIGINT) AS s1,
               CAST(sum(s * s) AS BIGINT) AS s2,
               CAST(sum(CASE WHEN prev IS NOT NULL THEN 1
                        ELSE 0 END) AS BIGINT) AS m,
               CAST(sum(CASE WHEN prev IS NOT NULL
                        THEN s - prev ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(sum(CASE WHEN prev IS NOT NULL
                        THEN (s - prev) * (s - prev)
                        ELSE 0 END) AS BIGINT) AS d2
        FROM f GROUP BY doc_id
        HAVING count(*) >= 4
    ),
    vv AS (
        SELECT doc_id,
               (CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)
                   AS varx,
               (CAST(d2 AS DOUBLE)
                - CAST(d1 AS DOUBLE) * CAST(d1 AS DOUBLE)
                  / CAST(m AS DOUBLE)) / CAST(m - 1 AS DOUBLE)
                   AS vard
        FROM agg
    )
    SELECT doc_id,
           sqrt(vard / 2.0e0) AS sd1,
           sqrt(2.0e0 * varx - vard / 2.0e0) AS sd2,
           sqrt(vard / 2.0e0)
               / sqrt(2.0e0 * varx - vard / 2.0e0) AS sd_ratio
    FROM vv
    """
    return q, sql


# -------------------------------------------------- events_extremal_index
def _extremal_query():
    def q(sf_dir: str):
        x = [int(v) for v in _hourly_counts(sf_dir)]
        u, ne, nc, theta = extremal_index(x)
        return pa.table({
            "threshold_u": pa.array([u], type=pa.int64()),
            "n_exceed": pa.array([ne], type=pa.int64()),
            "n_clusters": pa.array([nc], type=pa.int64()),
            "extremal_theta": pa.array([theta],
                                       type=pa.float64()),
        })

    US_PER_HOUR = 3_600_000_000
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour,
               CAST(COALESCE(hc.cnt, 0) AS BIGINT) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt) AS r
        FROM grid
    ),
    thr AS (
        SELECT cnt AS u FROM ranked
        WHERE r = (9 * (SELECT n FROM nn) + 9) // 10
    ),
    marks AS (
        SELECT hour,
               CASE WHEN cnt > (SELECT u FROM thr)
                    THEN 1 ELSE 0 END AS exc,
               lag(CASE WHEN cnt > (SELECT u FROM thr)
                        THEN 1 ELSE 0 END, 1, 0)
                   OVER (ORDER BY hour) AS p1,
               lag(CASE WHEN cnt > (SELECT u FROM thr)
                        THEN 1 ELSE 0 END, 2, 0)
                   OVER (ORDER BY hour) AS p2
        FROM grid
    ),
    s AS (
        SELECT CAST(sum(exc) AS BIGINT) AS ne,
               CAST(sum(CASE WHEN exc = 1 AND p1 = 0
                         AND p2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nc
        FROM marks
    )
    SELECT (SELECT u FROM thr) AS threshold_u,
           ne AS n_exceed, nc AS n_clusters,
           CAST(nc AS DOUBLE) / CAST(ne AS DOUBLE)
               AS extremal_theta
    FROM s
    """
    return q, sql


def build_wave213_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("doc_poincare_sd",) + _poincare_query()))
    add(*(("events_extremal_index",) + _extremal_query()))
    return queries, oracles
