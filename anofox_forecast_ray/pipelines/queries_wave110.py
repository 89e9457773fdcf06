"""Wave-110 query: Poisson deviance of the hourly counts.

- events_poisson_deviance: GLM-style residual deviance of the dense
  hourly counts under the hour-of-day-profile model mu(t) =
  hod_mean(t mod 24): D = 2 * sum [y ln(y/mu) - (y - mu)] (y = 0
  terms contribute 2*mu). The saturated-vs-model deviance is the
  proper count-data analogue of events_hod_anova's Gaussian F.
  mu is a ratio of exact ints per hod cell; terms fold in hour
  order with scalar logs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols


def _deviance_query():
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
        hod = (np.arange(span, dtype=np.int64) + h0) % 24
        s_h = np.zeros(24, dtype=np.int64)
        n_h = np.zeros(24, dtype=np.int64)
        np.add.at(s_h, hod, x)
        np.add.at(n_h, hod, 1)
        dev = 0.0
        for t_i in range(span):
            y = float(int(x[t_i]))
            h = int(hod[t_i])
            mu = float(int(s_h[h])) / float(int(n_h[h]))
            if y > 0:
                term = y * math.log(y / mu) - (y - mu)
            else:
                term = mu
            dev = dev + term
        dev = 2.0 * dev
        return pa.table({
            "n_hours": pa.array([span], type=pa.int64()),
            "deviance": pa.array([dev], type=pa.float64()),
            "dof": pa.array([span - 24], type=pa.int64()),
        })

    sql = """
    WITH e AS (
        SELECT epoch_us(ts) // 3600000000 AS hour FROM events
    ),
    bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
    cnts AS (
        SELECT hour, CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY hour
    ),
    dense AS (
        SELECT gs.hour, gs.hour % 24 AS hod,
               CAST(COALESCE(c.c, 0) AS BIGINT) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    prof AS (
        SELECT hod,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dense GROUP BY hod
    ),
    terms AS (
        SELECT d.hour,
               CASE WHEN d.x > 0
                    THEN CAST(d.x AS DOUBLE)
                         * ln(CAST(d.x AS DOUBLE)
                              / (CAST(p.s AS DOUBLE)
                                 / CAST(p.n AS DOUBLE)))
                         - (CAST(d.x AS DOUBLE)
                            - CAST(p.s AS DOUBLE)
                              / CAST(p.n AS DOUBLE))
                    ELSE CAST(p.s AS DOUBLE)
                         / CAST(p.n AS DOUBLE) END AS term
        FROM dense d JOIN prof p ON p.hod = d.hod
    )
    SELECT CAST((SELECT count(*) FROM dense) AS BIGINT)
               AS n_hours,
           2.0e0 * list_reduce(list_prepend(0.0e0,
               list(term ORDER BY hour)), (a, b) -> a + b)
               AS deviance,
           CAST((SELECT count(*) FROM dense) - 24 AS BIGINT)
               AS dof
    FROM terms
    """
    return q, sql


def build_wave110_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_poisson_deviance",) + _deviance_query()))
    return queries, oracles
