"""Wave-224 queries: variance-ratio test, zero-inflated Poisson.

- events_variance_ratio: the Lo-MacKinlay variance-ratio test for
  the random-walk hypothesis, treating the cumulative error count
  as the "price" path: VR(q) = Var(q-step increments) /
  (q Var(1-step increments)) with q = 5, both variances the
  explicit ddof-0 moment forms over exact integer increments, and
  the homoskedastic z = (VR - 1)/sqrt(2(2q-1)(q-1)/(3qT)).
- events_zip_mom: the zero-inflated Poisson method-of-moments fit
  over per-(user, day) error counts on the FULL user x day grid
  (structural zeros are real observations): lambda = (s2 + m^2 -
  m)/m and pi = 1 - m/lambda from exact integer moments — the
  count-model companion of the negative-binomial fit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave207 import _daily_ep

VR_Q = 5
US_PER_DAY = 86_400_000_000


def variance_ratio(x, qq: int = VR_Q):
    """(vr, z) over integer daily counts as 1-step increments of
    the cumulative path; ddof-0 variances, both mean-corrected."""
    n = len(x)
    t1 = n
    s1 = 0
    for v in x:
        s1 += int(v)
    mu = s1 / t1
    v1 = 0.0
    for v in x:
        v1 = v1 + (v - mu) * (v - mu)
    v1 = v1 / t1
    m = n - qq + 1
    vq = 0.0
    for i in range(m):
        s = 0
        for j in range(qq):
            s += int(x[i + j])
        d = s - qq * mu
        vq = vq + d * d
    vq = vq / m / qq
    vr = vq / v1
    z = (vr - 1.0e0) / math.sqrt(
        2.0e0 * (2 * qq - 1) * (qq - 1) / (3.0e0 * qq * t1))
    return vr, z


def zip_mom(n, s1, s2):
    """(mean, lam, pi) from int moments (ddof-0 variance)."""
    m = s1 / n
    var = (float(s2) - float(s1) * float(s1) / n) / n
    lam = (var + m * m - m) / m
    pi = 1.0e0 - m / lam
    return m, lam, pi


# ------------------------------------------------ events_variance_ratio
def _vr_query():
    def q(sf_dir: str):
        e, _ = _daily_ep(sf_dir)
        vr, z = variance_ratio([int(v) for v in e])
        return pa.table({
            "vr_q5": pa.array([vr], type=pa.float64()),
            "vr_z": pa.array([z], type=pa.float64()),
        })

    roll = " + ".join(f"x{j}" for j in range(VR_Q))
    lags = ", ".join(
        f"lag(x, {j}) OVER (ORDER BY day) AS x{j}"
        for j in range(1, VR_Q))
    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.e, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS t,
               CAST(sum(x) AS BIGINT) AS s1
        FROM d
    ),
    mu AS (
        SELECT t, CAST(s1 AS DOUBLE) / CAST(t AS DOUBLE) AS m
        FROM nn
    ),
    v1f AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((CAST(x AS DOUBLE) - mu.m)
                        * (CAST(x AS DOUBLE) - mu.m)
                        ORDER BY day)), (p, v) -> p + v)
               / CAST(mu.t AS DOUBLE) AS v1, mu.m, mu.t
        FROM d CROSS JOIN mu GROUP BY mu.m, mu.t
    ),
    rolls AS (
        SELECT day, x AS x0, {lags}
        FROM d
    ),
    qsum AS (
        SELECT day, CAST({roll} AS BIGINT) AS s
        FROM rolls WHERE x{VR_Q - 1} IS NOT NULL
    ),
    vqf AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((CAST(s AS DOUBLE)
                         - {VR_Q}.0e0 * v1f.m)
                        * (CAST(s AS DOUBLE)
                           - {VR_Q}.0e0 * v1f.m)
                        ORDER BY day)), (p, v) -> p + v)
               / CAST((SELECT count(*) FROM qsum) AS DOUBLE)
               / {VR_Q}.0e0 AS vq,
               v1f.v1, v1f.t
        FROM qsum CROSS JOIN v1f GROUP BY v1f.v1, v1f.t
    )
    SELECT vq / v1 AS vr_q5,
           (vq / v1 - 1.0e0)
           / sqrt(2.0e0 * {2 * VR_Q - 1} * {VR_Q - 1}
                  / (3.0e0 * {VR_Q} * CAST(t AS DOUBLE)))
               AS vr_z
    FROM vqf
    """
    return q, sql


# --------------------------------------------------------- events_zip_mom
def _zip_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            u = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error")
            day = tus // US_PER_DAY
            df = pd.DataFrame({"u": u[err], "d": day[err]})
            g = df.groupby(["u", "d"]).size().reset_index(
                name="c")
            lo, hi = int(day.min()), int(day.max())
            out = pa.table({
                "u": pa.array(g["u"].astype("int64")),
                "d": pa.array(g["d"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })
            meta = pa.table({
                "u": pa.array([-1], type=pa.int64()),
                "d": pa.array([lo], type=pa.int64()),
                "c": pa.array([hi], type=pa.int64()),
            })
            # -2 rows carry the distinct user ids seen in events
            uu = np.unique(u).astype(np.int64)
            users = pa.table({
                "u": pa.array(np.full(uu.size, -2,
                                      dtype=np.int64)),
                "d": pa.array(uu),
                "c": pa.array(np.zeros(uu.size,
                                       dtype=np.int64)),
            })
            return pa.concat_tables([out, meta, users])

        def merge(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            meta = df[df["u"] == -1]
            lo = int(meta["d"].min())
            hi = int(meta["c"].max())
            users = (df[df["u"] == -2][["d"]]
                     .drop_duplicates())
            g = (df[df["u"] >= 0].groupby(["u", "d"])["c"]
                 .sum().reset_index())
            out = pa.table({
                "u": pa.array(g["u"].astype("int64")),
                "d": pa.array(g["d"].astype("int64")),
                "c": pa.array(g["c"].astype("int64")),
            })
            meta2 = pa.table({
                "u": pa.array([-1], type=pa.int64()),
                "d": pa.array([lo], type=pa.int64()),
                "c": pa.array([hi], type=pa.int64()),
            })
            users2 = pa.table({
                "u": pa.array(np.full(len(users), -2,
                                      dtype=np.int64)),
                "d": pa.array(users["d"].to_numpy(np.int64)),
                "c": pa.array(np.zeros(len(users),
                                       dtype=np.int64)),
            })
            return pa.concat_tables([out, meta2, users2])

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        t = tree_reduce_tables(refs, merge).to_pandas()
        meta = t[t["u"] == -1]
        lo = int(meta["d"].min())
        hi = int(meta["c"].max())
        cells = t[t["u"] >= 0]
        n_users = t[t["u"] == -2]["d"].nunique()
        n_days = hi - lo + 1
        n = n_users * n_days
        s1 = int(cells["c"].sum())
        s2 = int((cells["c"].astype("int64") ** 2).sum())
        m, lam, pi = zip_mom(n, s1, s2)
        return pa.table({
            "n_cells": pa.array([n], type=pa.int64()),
            "mean_c": pa.array([m], type=pa.float64()),
            "zip_lambda": pa.array([lam], type=pa.float64()),
            "zip_pi": pa.array([pi], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    span AS (
        SELECT min(day) AS lo, max(day) AS hi,
               CAST(count(DISTINCT user_id) AS BIGINT) AS nu
        FROM e
    ),
    cells AS (
        SELECT user_id, day,
               CAST(sum(is_err) AS BIGINT) AS c
        FROM e GROUP BY user_id, day
        HAVING sum(is_err) > 0
    ),
    s AS (
        SELECT (SELECT nu FROM span)
                   * ((SELECT hi FROM span)
                      - (SELECT lo FROM span) + 1) AS n,
               CAST(coalesce(sum(c), 0) AS BIGINT) AS s1,
               CAST(coalesce(sum(c * c), 0) AS BIGINT) AS s2
        FROM cells
    ),
    mm AS (
        SELECT n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
               (CAST(s2 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                   AS var
        FROM s
    )
    SELECT n AS n_cells, m AS mean_c,
           (var + m * m - m) / m AS zip_lambda,
           1.0e0 - m / ((var + m * m - m) / m) AS zip_pi
    FROM mm
    """
    return q, sql


def build_wave224_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_variance_ratio",) + _vr_query()))
    add(*(("events_zip_mom",) + _zip_query()))
    return queries, oracles
