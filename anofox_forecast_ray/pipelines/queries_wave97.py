"""Wave-97 query: interrupted time-series (ITS) segmented fit.

- events_its_midpoint: the interrupted-time-series decomposition at
  the midpoint hour — separate OLS lines on the pre and post halves
  of the dense hourly count series, reporting slope_pre, slope_post,
  the level jump at the break (post intercept at the break minus pre
  line extrapolated to the break) and the slope change. Each side is
  a k=1 Cramer fit over hour-ordered folds of bounded cells — the
  causal-impact screen for deploy/incident analysis.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols


def _its_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "hour": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // 3_600_000_000
            uk, cnt = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64)),
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
        a = tree_reduce_tables(refs, merge).to_pandas()
        h0 = int(a["hour"].min())
        span = int(a["hour"].max()) - h0 + 1
        x = np.zeros(span, dtype=np.int64)
        x[a["hour"].to_numpy(np.int64) - h0] = (
            a["cnt"].to_numpy(np.int64))
        brk = span // 2

        def fit(lo, hi):
            # integer moment sums over t in [lo, hi)
            t = np.arange(lo, hi, dtype=np.int64)
            y = x[lo:hi]
            n = int(t.size)
            sx = int(t.sum())
            sy = int(y.sum())
            sxx = int((t * t).sum())
            sxy = int((t * y).sum())
            nf = float(n)
            slope = ((nf * float(sxy) - float(sx) * float(sy))
                     / (nf * float(sxx)
                        - float(sx) * float(sx)))
            intercept = (float(sy) - slope * float(sx)) / nf
            return slope, intercept

        s_pre, i_pre = fit(0, brk)
        s_post, i_post = fit(brk, span)
        jump = ((i_post + s_post * float(brk))
                - (i_pre + s_pre * float(brk)))
        return pa.table({
            "n_hours": pa.array([span], type=pa.int64()),
            "break_hour": pa.array([brk], type=pa.int64()),
            "slope_pre": pa.array([s_pre], type=pa.float64()),
            "slope_post": pa.array([s_post], type=pa.float64()),
            "level_jump": pa.array([jump], type=pa.float64()),
            "slope_change": pa.array([s_post - s_pre],
                                     type=pa.float64()),
        })

    def fit_sql(cond: str, tag: str) -> str:
        return f"""
    m{tag} AS (
        SELECT CAST(count(*) AS DOUBLE) AS nf,
               CAST(sum(t) AS DOUBLE) AS sx,
               CAST(sum(x) AS DOUBLE) AS sy,
               CAST(sum(t * t) AS DOUBLE) AS sxx,
               CAST(sum(t * x) AS DOUBLE) AS sxy
        FROM dense WHERE {cond}
    ),
    f{tag} AS (
        SELECT (nf * sxy - sx * sy) / (nf * sxx - sx * sx)
                   AS slope,
               (sy - (nf * sxy - sx * sy)
                     / (nf * sxx - sx * sx) * sx) / nf
                   AS intercept
        FROM m{tag}
    )"""

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour - (SELECT h0 FROM bounds) AS t,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    st AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) // 2 AS BIGINT) AS brk
        FROM dense
    ),{fit_sql("t < (SELECT brk FROM st)", "pre")},{fit_sql(
        "t >= (SELECT brk FROM st)", "post")}
    SELECT st.n AS n_hours, st.brk AS break_hour,
           fpre.slope AS slope_pre,
           fpost.slope AS slope_post,
           (fpost.intercept + fpost.slope
                * CAST(st.brk AS DOUBLE))
           - (fpre.intercept + fpre.slope
                * CAST(st.brk AS DOUBLE)) AS level_jump,
           fpost.slope - fpre.slope AS slope_change
    FROM st CROSS JOIN fpre CROSS JOIN fpost
    """
    return q, sql


def build_wave97_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_its_midpoint",) + _its_query()))
    return queries, oracles
