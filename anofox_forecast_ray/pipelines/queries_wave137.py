"""Wave-137 queries: Kalman local-level filter, Nadaraya-Watson.

- events_kalman_level: a fixed-parameter (q=1, r=25) local-level
  Kalman filter over the dense hourly count series — the canonical
  sequential state-space fold. The engine runs the textbook
  predict/update recursion as a strict left fold; the oracle
  replays it with a 4-element LIST accumulator
  [level, P, sum_lnF, sum_v2F] in DuckDB's list_reduce (struct
  accumulators are buggy in 1.0 — NOTES rule), and the Gaussian
  log-likelihood is assembled from the two fold sums with scalar
  arithmetic.
- events_nadaraya_watson: Gaussian-kernel regression of daily
  totals on the day index (bandwidth h=3 days) with leave-one-out
  residuals. Every fitted value is a ratio of two s-ordered folds
  over the bounded day grid (one exp per pair, identical scalars on
  both sides); the LOO fit subtracts the self-weight term exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
KF_Q = 1.0
KF_R = 25.0
NW_H = 3.0


def _hourly_counts(sf_dir: str):
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
    cnt = np.zeros(hmax - hmin + 1, dtype=np.int64)
    cnt[h["hour"].to_numpy(np.int64) - hmin] = (
        h["cnt"].to_numpy(np.int64))
    return cnt


# -------------------------------------------------------- events_kalman_level
def _kalman_query(qv: float = KF_Q, rv: float = KF_R):
    def q(sf_dir: str):
        y = [int(v) for v in _hourly_counts(sf_dir)]
        n = len(y)
        lvl = float(y[0])
        p = rv
        a1 = 0.0  # sum ln F
        a2 = 0.0  # sum v^2 / F
        for t_i in range(1, n):
            pp = p + qv
            f = pp + rv
            v = float(y[t_i]) - lvl
            k = pp / f
            lvl = lvl + k * v
            p = (1.0 - k) * pp
            a1 = a1 + math.log(f)
            a2 = a2 + (v * v) / f
        nf = float(n - 1)
        loglik = -0.5 * (nf * math.log(2.0 * math.pi)
                         + a1 + a2)
        return pa.table({
            "n_obs": pa.array([n], type=pa.int64()),
            "level_end": pa.array([lvl], type=pa.float64()),
            "p_end": pa.array([p], type=pa.float64()),
            "sum_lnf": pa.array([a1], type=pa.float64()),
            "sum_v2f": pa.array([a2], type=pa.float64()),
            "loglik": pa.array([loglik], type=pa.float64()),
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
    l AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               list(CAST(cnt AS DOUBLE) ORDER BY hour) AS ys
        FROM grid
    ),
    st AS (
        SELECT n,
               list_reduce(
                   list_prepend([ys[1], {rv!r}, 0.0e0, 0.0e0],
                       list_transform(ys[2:CAST(n AS INTEGER)],
                                      v -> [v, 0.0e0, 0.0e0,
                                            0.0e0])),
                   (acc, e) -> [
                       acc[1] + ((acc[2] + {qv!r})
                                 / (acc[2] + {qv!r} + {rv!r}))
                               * (e[1] - acc[1]),
                       (1.0e0 - (acc[2] + {qv!r})
                                / (acc[2] + {qv!r} + {rv!r}))
                           * (acc[2] + {qv!r}),
                       acc[3] + ln(acc[2] + {qv!r} + {rv!r}),
                       acc[4] + ((e[1] - acc[1])
                                 * (e[1] - acc[1]))
                               / (acc[2] + {qv!r} + {rv!r})])
                   AS fin
        FROM l
    )
    SELECT n AS n_obs,
           fin[1] AS level_end,
           fin[2] AS p_end,
           fin[3] AS sum_lnf,
           fin[4] AS sum_v2f,
           -0.5e0 * (CAST(n - 1 AS DOUBLE)
                     * ln(2.0e0 * pi())
                     + fin[3] + fin[4]) AS loglik
    FROM st
    """
    return q, sql


# ---------------------------------------------------- events_nadaraya_watson
def _nw_query(h_bw: float = NW_H):
    def q(sf_dir: str):
        cnt = _hourly_counts(sf_dir)
        n_hours = len(cnt)
        n_days = n_hours // 24
        days = []
        for d in range(n_days):
            tot = 0
            for j in range(24):
                tot += int(cnt[d * 24 + j])
            days.append(tot)

        out = {"day": [], "y": [], "fitted": [], "loo": []}
        for t_i in range(n_days):
            num = 0.0
            den = 0.0
            for s in range(n_days):
                u = (float(t_i) - float(s)) / h_bw
                w = math.exp(-0.5 * (u * u))
                num = num + w * float(days[s])
                den = den + w
            fitted = num / den
            loo = (num - 1.0 * float(days[t_i])) \
                / (den - 1.0)
            out["day"].append(t_i)
            out["y"].append(days[t_i])
            out["fitted"].append(fitted)
            out["loo"].append(loo)
        return pa.table({
            "day": pa.array(out["day"], type=pa.int64()),
            "y": pa.array(out["y"], type=pa.int64()),
            "fitted": pa.array(out["fitted"],
                               type=pa.float64()),
            "loo_fit": pa.array(out["loo"],
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
    idx AS (
        SELECT CAST(row_number() OVER (ORDER BY hour) - 1
                    AS BIGINT) AS i, cnt
        FROM grid
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) // 24 AS n_days
           FROM idx),
    days AS (
        SELECT i // 24 AS day,
               CAST(sum(cnt) AS BIGINT) AS y
        FROM idx, nd WHERE i < nd.n_days * 24
        GROUP BY 1
    ),
    pairs AS (
        SELECT a.day AS t, b.day AS s, b.y,
               exp(-0.5e0 * (((CAST(a.day AS DOUBLE)
                               - CAST(b.day AS DOUBLE))
                              / {h_bw!r})
                             * ((CAST(a.day AS DOUBLE)
                                 - CAST(b.day AS DOUBLE))
                                / {h_bw!r}))) AS w
        FROM days a CROSS JOIN days b
    ),
    folds AS (
        SELECT t,
               list_reduce(list_prepend(0.0e0,
                   list(w * CAST(y AS DOUBLE) ORDER BY s)),
                   (x, y) -> x + y) AS num,
               list_reduce(list_prepend(0.0e0,
                   list(w ORDER BY s)),
                   (x, y) -> x + y) AS den
        FROM pairs GROUP BY t
    )
    SELECT f.t AS day,
           d.y AS y,
           f.num / f.den AS fitted,
           (f.num - 1.0e0 * CAST(d.y AS DOUBLE))
               / (f.den - 1.0e0) AS loo_fit
    FROM folds f JOIN days d ON d.day = f.t
    ORDER BY f.t
    """
    return q, sql


def build_wave137_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_kalman_level",) + _kalman_query()))
    add(*(("events_nadaraya_watson",) + _nw_query()))
    return queries, oracles
