"""Wave-148 queries: Poisson scan statistic, VaR / CVaR.

- events_scan_statistic: the epidemiological burst detector — the
  maximum event count over all 6-hour windows (stride 1h, windowed
  integer sums from cumulative counts), its expectation under a
  homogeneous Poisson, and a Bonferroni-corrected p-value from the
  exact Poisson upper tail. The tail follows the wave-147 rule:
  ONE anchored transcendental (pmf at the observed max via
  Lanczos lgamma + exp) and an exact rational pmf recurrence
  folded DOWNWARD with a 2-slot LIST accumulator (P(X >= m) summed
  from m upward would not terminate, so we sum 1 - P(X <= m-1)
  upward from pmf(0) = exp(-lambda) instead — pmf(0) is one exp,
  the recurrence pmf(k+1) = pmf(k) * lambda/(k+1) is rational).
- events_var_cvar: Value-at-Risk and expected shortfall of daily
  error counts at q = 0.9 — the exact ceil(qn) order statistic and
  the mean of the tail at-or-above it (integer sum, one division).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
SCAN_W = 6


# -------------------------------------------------- events_scan_statistic
def _scan_query(w: int = SCAN_W):
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
        hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
        n = hmax - hmin + 1
        cnt = np.zeros(n, dtype=np.int64)
        cnt[h["hour"].to_numpy(np.int64) - hmin] = (
            h["cnt"].to_numpy(np.int64))
        total = int(cnt.sum())

        # windowed sums via cumulative counts
        cum = np.concatenate([[0], np.cumsum(cnt)])
        wins = cum[w:] - cum[:-w]
        n_win = len(wins)
        mx = int(wins.max())
        arg = int(np.argmax(wins))  # first max

        lam = (float(total) / float(n)) * float(w)
        # P(X <= mx - 1) built upward from pmf(0) = exp(-lam)
        pmf = math.exp(-lam)
        cdf = pmf
        for k in range(0, mx - 1):
            pmf = pmf * (lam / float(k + 1))
            cdf = cdf + pmf
        p_tail = 1.0 - cdf
        p_bonf = float(n_win) * p_tail
        if p_bonf > 1.0:
            p_bonf = 1.0
        return pa.table({
            "n_windows": pa.array([n_win], type=pa.int64()),
            "max_count": pa.array([mx], type=pa.int64()),
            "win_start_hour": pa.array([hmin + arg],
                                       type=pa.int64()),
            "lambda_w": pa.array([lam], type=pa.float64()),
            "p_tail": pa.array([p_tail], type=pa.float64()),
            "p_bonferroni": pa.array([p_bonf],
                                     type=pa.float64()),
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
    wins AS (
        SELECT hour,
               CAST(sum(cnt) OVER (ORDER BY hour
                    ROWS BETWEEN CURRENT ROW
                    AND {w - 1} FOLLOWING) AS BIGINT) AS wsum,
               CAST(count(*) OVER (ORDER BY hour
                    ROWS BETWEEN CURRENT ROW
                    AND {w - 1} FOLLOWING) AS BIGINT) AS wn
        FROM grid
    ),
    full_ AS (SELECT hour, wsum FROM wins WHERE wn = {w}),
    best AS (
        SELECT hour AS win_start_hour, wsum AS max_count
        FROM full_ ORDER BY wsum DESC, hour ASC LIMIT 1
    ),
    nn AS (
        SELECT CAST(count(*) AS BIGINT) AS n_win FROM full_
    ),
    lam AS (
        SELECT (CAST(sum(cnt) AS DOUBLE)
                / CAST(count(*) AS DOUBLE))
               * CAST({w} AS DOUBLE) AS l
        FROM grid
    ),
    tail AS (
        SELECT best.max_count,
               list_reduce(
                   list_prepend(
                       [exp(-lam.l), exp(-lam.l)],
                       list_transform(
                           generate_series(0,
                               CAST(best.max_count - 2
                                    AS BIGINT)),
                           k -> [CAST(k AS DOUBLE), 0.0e0])),
                   (acc, e) -> [
                       acc[1] * (lam.l / (e[1] + 1.0e0)),
                       acc[2] + acc[1]
                           * (lam.l / (e[1] + 1.0e0))])
                   AS fin
        FROM best CROSS JOIN lam
    )
    SELECT nn.n_win AS n_windows,
           best.max_count AS max_count,
           best.win_start_hour AS win_start_hour,
           lam.l AS lambda_w,
           1.0e0 - tail.fin[2] AS p_tail,
           LEAST(CAST(nn.n_win AS DOUBLE)
                 * (1.0e0 - tail.fin[2]), 1.0e0)
               AS p_bonferroni
    FROM nn CROSS JOIN best CROSS JOIN lam CROSS JOIN tail
    """
    return q, sql


# -------------------------------------------------------- events_var_cvar
def _var_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "err": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            day = tus // US_PER_DAY
            ud, inv = np.unique(day, return_inverse=True)
            err = np.bincount(inv[et == "error"],
                              minlength=ud.size)
            return pa.table({
                "day": pa.array(ud.astype(np.int64)),
                "err": pa.array(err.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate([("err", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "err": g.column("err_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        d = tree_reduce_tables(refs, merge).to_pandas()
        xs = sorted(int(v) for v in d["err"])
        n = len(xs)
        k = (9 * n + 9) // 10  # ceil(0.9 n)
        var = xs[k - 1]
        tail = xs[k - 1:]
        s = sum(tail)
        cvar = float(s) / float(len(tail))
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "var_90": pa.array([var], type=pa.int64()),
            "tail_days": pa.array([len(tail)],
                                  type=pa.int64()),
            "cvar_90": pa.array([cvar], type=pa.float64()),
        })

    sql = f"""
    WITH dc AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS err
        FROM events GROUP BY 1
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dc),
    rk AS (
        SELECT err, row_number() OVER (ORDER BY err) AS r
        FROM dc
    ),
    kk AS (SELECT (9 * n + 9) // 10 AS k, n FROM nn)
    SELECT kk.n AS n_days,
           (SELECT err FROM rk, kk WHERE r = kk.k) AS var_90,
           (SELECT CAST(count(*) AS BIGINT) FROM rk, kk
            WHERE r >= kk.k) AS tail_days,
           (SELECT CAST(sum(err) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE)
            FROM rk, kk WHERE r >= kk.k) AS cvar_90
    FROM kk
    """
    return q, sql


def build_wave148_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_scan_statistic",) + _scan_query()))
    add(*(("events_var_cvar",) + _var_query()))
    return queries, oracles
