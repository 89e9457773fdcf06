"""Wave-109 query: Ljung-Box on SES residuals of the hourly tier.

- events_ses_residual_lb: the residual-whiteness diagnostic closing
  the monitoring loop — run fixed-alpha SES (0.3) over the dense
  hourly counts, take the one-step-ahead residuals e_t = y_t -
  level_(t-1), and compute the Ljung-Box Q statistic over lags
  1..8: Q = n(n+2) sum_k r_k^2/(n-k). The SES recursion is the
  proven sequential fold; residual autocovariances fold in t order
  (centered two-pass: residual mean first); every float expression
  is spelled identically in SQL (nested prefix folds replay the
  running level, O(n^2) with n ~ 720 — fine for an oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols

LB_ALPHA = 0.3
LB_LAGS = 8


def _ses_lb_query(alpha: float = LB_ALPHA, lags: int = LB_LAGS):
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
        # one-step residuals under fixed-alpha SES
        level = float(int(x[0]))
        res = []
        for t_i in range(1, span):
            y = float(int(x[t_i]))
            res.append(y - level)
            level = alpha * y + (1.0 - alpha) * level
        n = len(res)
        # two-pass centered autocorrelations (t-ordered folds)
        sm = 0.0
        for e in res:
            sm = sm + e
        mu = sm / float(n)
        den = 0.0
        for e in res:
            den = den + (e - mu) * (e - mu)
        q_stat = 0.0
        rks = []
        for k in range(1, lags + 1):
            num = 0.0
            for i in range(n - k):
                num = num + (res[i] - mu) * (res[i + k] - mu)
            rk = num / den
            rks.append(rk)
            q_stat = q_stat + (rk * rk) / float(n - k)
        q_stat = float(n) * (float(n) + 2.0) * q_stat
        return pa.table({
            "n_resid": pa.array([n], type=pa.int64()),
            "r1": pa.array([rks[0]], type=pa.float64()),
            "lb_q": pa.array([q_stat], type=pa.float64()),
        })

    aa = f"{alpha}e0"
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
               CAST(COALESCE(c.c, 0) AS DOUBLE) AS x
        FROM (SELECT unnest(generate_series(
                  (SELECT h0 FROM bounds),
                  (SELECT h1 FROM bounds))) AS hour) gs
        LEFT JOIN cnts c ON c.hour = gs.hour
    ),
    l AS (
        SELECT list(x ORDER BY t) AS ms,
               CAST(count(*) AS BIGINT) AS n
        FROM dense
    ),
    res AS (
        SELECT n - 1 AS nr,
               list_transform(
                   generate_series(2, CAST(n AS INTEGER)),
                   i -> ms[i] - list_reduce(
                       ms[1:i - 1],
                       (acc, x) -> {aa} * x
                                   + (1.0e0 - {aa}) * acc)) AS r
        FROM l
    ),
    mu AS (
        SELECT nr, r,
               list_reduce(list_prepend(0.0e0, r),
                           (a, b) -> a + b)
                   / CAST(nr AS DOUBLE) AS m
        FROM res
    ),
    den AS (
        SELECT nr, r, m,
               list_reduce(list_prepend(0.0e0, list_transform(
                   r, v -> (v - m) * (v - m))),
                   (a, b) -> a + b) AS d
        FROM mu
    ),
    qs AS (
        SELECT nr,
               (list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, CAST(nr - 1 AS INTEGER)),
                   i -> (r[i] - m) * (r[i + 1] - m))),
                   (a, b) -> a + b) / d) AS r1,
               list_reduce(list_prepend(0.0e0, list_transform(
                   generate_series(1, {lags}),
                   k -> (list_reduce(list_prepend(0.0e0,
                           list_transform(
                               generate_series(1,
                                   CAST(nr - k AS INTEGER)),
                               i -> (r[i] - m)
                                    * (r[CAST(i + k AS INTEGER)]
                                       - m))),
                           (a, b) -> a + b) / d)
                        * (list_reduce(list_prepend(0.0e0,
                           list_transform(
                               generate_series(1,
                                   CAST(nr - k AS INTEGER)),
                               i -> (r[i] - m)
                                    * (r[CAST(i + k AS INTEGER)]
                                       - m))),
                           (a, b) -> a + b) / d)
                        / CAST(nr - k AS DOUBLE))),
                   (a, b) -> a + b) AS qsum
        FROM den
    )
    SELECT CAST(nr AS BIGINT) AS n_resid, r1,
           CAST(nr AS DOUBLE) * (CAST(nr AS DOUBLE) + 2.0e0)
               * qsum AS lb_q
    FROM qs
    """
    return q, sql


def build_wave109_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_ses_residual_lb",) + _ses_lb_query()))
    return queries, oracles
