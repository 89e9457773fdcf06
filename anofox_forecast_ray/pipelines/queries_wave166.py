"""Wave-166 queries: quantile-sketch accuracy, inspection paradox.

- events_quantile_sketch_error: completes the sketch-accuracy
  family (Bloom FPR, CMS overestimate, KMV/HLL relative error) —
  a fixed 64-bucket equi-width histogram sketch of the hourly
  count distribution, its q50/q90/q99 estimates (bucket lower edge
  + within-bucket linear interpolation, all from integer bucket
  counts with one division per quantile), and the exact RANK error
  of each estimate against the true order statistics.
- events_inspection_paradox: the renewal-theory demo — the
  time-averaged AGE of the current interarrival gap equals
  sum(g^2) / (2 sum(g)) exactly (integer microsecond sums, HUGEINT
  squares), which exceeds mean_gap/2 whenever gaps vary; the ratio
  2*age/mean = E[X^2]/E[X]^2 is the size-bias factor. Within-day
  gaps only (the repo's drain-overnight convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
QS_BUCKETS = 64
QS_QS = [(1, 2), (9, 10), (99, 100)]


# ---------------------------------------------- events_quantile_sketch_error
def _sketch_query(nb: int = QS_BUCKETS):
    def q(sf_dir: str):
        from .queries_wave160 import _hourly

        y = _hourly(sf_dir)
        n = len(y)
        lo = int(y.min())
        hi = int(y.max())
        width = (hi - lo) // nb + 1
        b = (y - lo) // width
        hist = np.bincount(b, minlength=nb)
        ys = np.sort(y)

        out = {"q_num": [], "q_den": [], "estimate": [],
               "exact": [], "rank_err": []}
        for num, den in QS_QS:
            k = (n * num + den - 1) // den  # ceil(q*n)
            exact = int(ys[k - 1])
            # sketch estimate: walk buckets, interpolate
            cum = 0
            est = float(lo)
            for j in range(nb):
                c = int(hist[j])
                if cum + c >= k:
                    within = (float(k - cum) - 0.5) \
                        / float(c)
                    est = float(lo + j * width) \
                        + within * float(width)
                    break
                cum += c
            # exact rank of the estimate value
            rk = int(np.searchsorted(ys, est,
                                     side="right"))
            rank_err = abs(rk - k)
            out["q_num"].append(num)
            out["q_den"].append(den)
            out["estimate"].append(est)
            out["exact"].append(exact)
            out["rank_err"].append(rank_err)
        return pa.table({
            "q_num": pa.array(out["q_num"],
                              type=pa.int64()),
            "q_den": pa.array(out["q_den"],
                              type=pa.int64()),
            "estimate": pa.array(out["estimate"],
                                 type=pa.float64()),
            "exact": pa.array(out["exact"],
                              type=pa.int64()),
            "rank_err": pa.array(out["rank_err"],
                                 type=pa.int64()),
        })

    qs_rows = ", ".join(f"({a}, {b})" for a, b in QS_QS)
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(min(cnt) AS BIGINT) AS lo,
               (CAST(max(cnt) AS BIGINT)
                - CAST(min(cnt) AS BIGINT)) // {nb} + 1
                   AS width
        FROM grid
    ),
    hist AS (
        SELECT (cnt - nn.lo) // nn.width AS j,
               CAST(count(*) AS BIGINT) AS c
        FROM grid CROSS JOIN nn GROUP BY 1
    ),
    scan AS (
        SELECT j, c,
               CAST(COALESCE(sum(c) OVER (ORDER BY j
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cum
        FROM hist
    ),
    qs AS (SELECT * FROM (VALUES {qs_rows})
           AS t(q_num, q_den)),
    ks AS (
        SELECT q_num, q_den,
               (nn.n * q_num + q_den - 1) // q_den AS k
        FROM qs CROSS JOIN nn
    ),
    est AS (
        SELECT ks.q_num, ks.q_den, ks.k,
               (SELECT CAST(nn.lo + s.j * nn.width
                            AS DOUBLE)
                       + ((CAST(ks.k - s.cum AS DOUBLE)
                           - 0.5e0) / CAST(s.c AS DOUBLE))
                         * CAST(nn.width AS DOUBLE)
                FROM scan s CROSS JOIN nn
                WHERE s.cum + s.c >= ks.k
                ORDER BY s.j LIMIT 1) AS estimate
        FROM ks
    ),
    rk AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt) AS r
        FROM grid
    )
    SELECT CAST(e.q_num AS BIGINT) AS q_num,
           CAST(e.q_den AS BIGINT) AS q_den,
           e.estimate AS estimate,
           (SELECT cnt FROM rk WHERE r = e.k) AS exact,
           abs((SELECT CAST(count(*) AS BIGINT) FROM grid
                WHERE CAST(cnt AS DOUBLE) <= e.estimate)
               - e.k) AS rank_err
    FROM est e
    ORDER BY e.q_den, e.q_num
    """
    return q, sql


# ------------------------------------------------ events_inspection_paradox
def _inspection_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "day": pa.array(
                    (tus // US_PER_DAY).astype(np.int64)),
                "tus": pa.array(tus),
            })

        def gaps(g: pa.Table) -> pa.Table:
            tus = np.sort(
                g.column("tus").to_numpy(zero_copy_only=False)
            )
            d = np.diff(tus)
            s = int(d.sum())
            ss = sum(int(v) * int(v) for v in d.tolist())
            return pa.table({
                "s": pa.array([s], type=pa.int64()),
                "ss": pa.array([str(ss)],
                               type=pa.string()),
                "c": pa.array([int(d.size)],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ss = sum(int(v) for v in
                     t.column("ss").to_pylist())
            return pa.table({
                "s": pa.array([pc.sum(t.column("s")).as_py()],
                              type=pa.int64()),
                "ss": pa.array([str(ss)], type=pa.string()),
                "c": pa.array([pc.sum(t.column("c")).as_py()],
                              type=pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("day")
            .map_groups(gaps, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        s = int(a["s"].iloc[0])
        ss = int(a["ss"].iloc[0])
        c = int(a["c"].iloc[0])
        mean_gap = (float(s) / 1000000.0) / float(c)
        age = (float(ss) / 1e12) / (2.0 * (float(s) / 1e6))
        ratio = (2.0 * age) / mean_gap
        return pa.table({
            "n_gaps": pa.array([c], type=pa.int64()),
            "mean_gap_s": pa.array([mean_gap],
                                   type=pa.float64()),
            "time_avg_age_s": pa.array([age],
                                       type=pa.float64()),
            "size_bias_ratio": pa.array([ratio],
                                        type=pa.float64()),
        })

    sql = f"""
    WITH gaps AS (
        SELECT g FROM (
            SELECT tus - lag(tus) OVER (
                       PARTITION BY day ORDER BY tus) AS g
            FROM (SELECT epoch_us(ts) // {US_PER_DAY} AS day,
                         epoch_us(ts) AS tus FROM events))
        WHERE g IS NOT NULL
    ),
    agg AS (
        SELECT CAST(sum(g) AS BIGINT) AS s,
               CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT)
                   AS ss,
               CAST(count(*) AS BIGINT) AS c
        FROM gaps
    )
    SELECT c AS n_gaps,
           (CAST(s AS DOUBLE) / 1000000.0e0)
               / CAST(c AS DOUBLE) AS mean_gap_s,
           (CAST(ss AS DOUBLE) / 1e12)
               / (2.0e0 * (CAST(s AS DOUBLE) / 1e6))
               AS time_avg_age_s,
           (2.0e0 * ((CAST(ss AS DOUBLE) / 1e12)
                     / (2.0e0 * (CAST(s AS DOUBLE) / 1e6))))
               / ((CAST(s AS DOUBLE) / 1000000.0e0)
                  / CAST(c AS DOUBLE)) AS size_bias_ratio
    FROM agg
    """
    return q, sql


def build_wave166_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_quantile_sketch_error",) + _sketch_query()))
    add(*(("events_inspection_paradox",)
          + _inspection_query()))
    return queries, oracles
