"""Wave-220 queries: power-law MLE, Bartels rank von Neumann.

- events_user_powerlaw: the Clauset-Shalizi-Newman (2009, eq 3.7)
  discrete power-law MLE over per-user event counts with xmin = 1:
  alpha = 1 + n / sum ln(x_i / (xmin - 0.5)) — one scalar ln per
  DISTINCT count from the bounded histogram, fold in value order.
  The discrete-count companion of the Hill tail estimator.
- events_bartels_rvn: Bartels' (1982) rank version of the von
  Neumann ratio — the nonparametric randomness test — on the
  zero-filled daily error counts: with DOUBLED midranks m2 (exact
  tie handling), RVN = sum (m2_i - m2_{i+1})^2 / sum (m2_i -
  (n+1))^2 is a pure integer ratio, ONE division. RVN near 2 =
  random; < 2 = positive serial dependence.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000


def powerlaw_alpha(values, counts, xmin: int = 1):
    """(n, alpha) from the >=xmin histogram; fold value order."""
    n = 0
    s = 0.0
    for v, c in zip(values, counts):
        if v < xmin:
            continue
        n += int(c)
        s = s + int(c) * math.log(int(v) / (xmin - 0.5e0))
    return n, 1.0e0 + n / s


def bartels_rvn(x):
    """(num, den, rvn) via doubled midranks; exact ints."""
    n = len(x)
    vals = sorted(set(int(v) for v in x))
    import collections

    cnt = collections.Counter(int(v) for v in x)
    cum = 0
    m2map = {}
    for v in vals:
        c = cnt[v]
        m2map[v] = 2 * cum + c + 1
        cum += c
    m2 = [m2map[int(v)] for v in x]
    num = 0
    for i in range(n - 1):
        num += (m2[i] - m2[i + 1]) ** 2
    den = 0
    for v in m2:
        den += (v - (n + 1)) ** 2
    return num, den, num / den


# --------------------------------------------- events_user_powerlaw
def _powerlaw_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def partial(t: pa.Table) -> pa.Table:
            u = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uk, c = np.unique(u, return_counts=True)
            return pa.table({
                "user_id": pa.array(uk.astype(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge_bucket(g: pa.Table) -> pa.Table:
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            c = g.column("c").to_numpy(zero_copy_only=False)
            order = np.argsort(u, kind="stable")
            u_s, c_s = u[order], c[order]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            per_user = np.add.reduceat(c_s, starts)
            uv, nu = np.unique(per_user, return_counts=True)
            return pa.table({
                "v": pa.array(uv, type=pa.int64()),
                "nu": pa.array(nu.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("v").aggregate([("nu", "sum")])
            return pa.table({
                "v": g.column("v").cast(pa.int64()),
                "nu": g.column("nu_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(merge_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("v").reset_index(drop=True)
        n, alpha = powerlaw_alpha(
            [int(v) for v in h["v"]],
            [int(v) for v in h["nu"]])
        return pa.table({
            "n_users": pa.array([n], type=pa.int64()),
            "alpha_hat": pa.array([alpha], type=pa.float64()),
        })

    sql = """
    WITH ua AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY user_id
    ),
    hist AS (
        SELECT x AS v, CAST(count(*) AS BIGINT) AS nu
        FROM ua GROUP BY x
    ),
    s AS (
        SELECT CAST(sum(nu) AS BIGINT) AS n,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(nu AS DOUBLE)
                        * ln(CAST(v AS DOUBLE) / 0.5e0)
                        ORDER BY v)), (p, x) -> p + x) AS lsum
        FROM hist WHERE v >= 1
    )
    SELECT n AS n_users,
           1.0e0 + CAST(n AS DOUBLE) / lsum AS alpha_hat
    FROM s
    """
    return q, sql


# --------------------------------------------------- events_bartels_rvn
def _bartels_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if tus.size == 0:
                return pa.table({
                    "day": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                })
            day = tus // US_PER_DAY
            err = (np.asarray(t.column("event_type").to_pylist())
                   == "error")
            lo, hi = int(day.min()), int(day.max())
            span = hi - lo + 1
            cnt = np.bincount((day[err] - lo).astype(np.int64),
                              minlength=span).astype(np.int64)
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(cnt),
                "lo": pa.array(np.full(span, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(span, hi,
                                       dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            lo = int(df["lo"].min())
            hi = int(df["hi"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            g = df.groupby("day")["c"].sum()
            c = np.zeros(grid.size, dtype=np.int64)
            c[g.index.to_numpy(np.int64) - lo] = g.to_numpy(
                np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(c),
                "lo": pa.array(np.full(grid.size, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(grid.size, hi,
                                       dtype=np.int64)),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("day").reset_index(drop=True)
        num, den, rvn = bartels_rvn([int(v) for v in h["c"]])
        return pa.table({
            "rvn_num": pa.array([num], type=pa.int64()),
            "rvn_den": pa.array([den], type=pa.int64()),
            "bartels_rvn": pa.array([rvn], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_err
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.err, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_err) AS err FROM e GROUP BY day
        ) c ON g.day = c.day
    ),
    hist AS (
        SELECT x, CAST(count(*) AS BIGINT) AS c,
               CAST(coalesce(sum(count(*)) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) AS BIGINT) AS cum_b
        FROM d GROUP BY x
    ),
    ranked AS (
        SELECT d.day, 2 * hist.cum_b + hist.c + 1 AS m2
        FROM d JOIN hist ON d.x = hist.x
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    num_t AS (
        SELECT CAST(sum((m2 - nxt) * (m2 - nxt)) AS BIGINT)
                   AS num
        FROM (SELECT m2,
                     lead(m2) OVER (ORDER BY day) AS nxt
              FROM ranked)
        WHERE nxt IS NOT NULL
    ),
    den_t AS (
        SELECT CAST(sum((m2 - ((SELECT n FROM nn) + 1))
                        * (m2 - ((SELECT n FROM nn) + 1)))
                    AS BIGINT) AS den
        FROM ranked
    )
    SELECT num_t.num AS rvn_num, den_t.den AS rvn_den,
           CAST(num_t.num AS DOUBLE)
               / CAST(den_t.den AS DOUBLE) AS bartels_rvn
    FROM num_t CROSS JOIN den_t
    """
    return q, sql


def build_wave220_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_user_powerlaw",) + _powerlaw_query()))
    add(*(("events_bartels_rvn",) + _bartels_query()))
    return queries, oracles
