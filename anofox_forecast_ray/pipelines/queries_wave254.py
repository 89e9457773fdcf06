"""Wave-254 queries: Baxter-King bandpass and panel variance split.

events_baxter_king: the Baxter-King (1999) bandpass filter isolating
the 5-15 day cycle band of daily error counts with truncation K=6.
Weights are closed-form trig expressions (same libm sin/pi on both
sides); the zero-sum adjustment, each windowed convolution, and the
cycle-energy accumulation are all SEQUENTIAL float folds in explicit
(j, then t) order via list_reduce — the deterministic-float-pipeline
discipline, since nothing here is integer.  Emits the number of
interior points, the cycle variance and its share of the (exact
integer) interior variance.

events_between_within: the classic panel variance decomposition of
the dense user×day activity lattice — between-user vs within-user
sums of squares.  With a balanced panel (every user spans the same
D-day grid) both shares and the user-effect F statistic are ratios
of exact integers (n·ΣSu² − D·S² etc.), plus ICC(1,1) from the same
four integers.  The user-panel companion of source_icc.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000

BK_K = 6
BK_PL = 5.0
BK_PH = 15.0


def bk_weights():
    """Baxter-King weights w[0..K], zero-sum adjusted, exact float
    replay order."""
    om1 = 2.0 * math.pi / BK_PH
    om2 = 2.0 * math.pi / BK_PL
    b = [(om2 - om1) / math.pi]
    for j in range(1, BK_K + 1):
        fj = float(j)
        b.append((math.sin(om2 * fj) - math.sin(om1 * fj))
                 / (math.pi * fj))
    s = b[0]
    for j in range(1, BK_K + 1):
        s = s + 2.0 * b[j]
    theta = -(s / (2.0 * float(BK_K) + 1.0))
    return [v + theta for v in b]


def baxter_king(y):
    """(m, cycle_var, share) over interior points K..n-1-K."""
    w = bk_weights()
    n = len(y)
    num = 0.0
    mids = []
    for t in range(BK_K, n - BK_K):
        c = 0.0
        for j in range(-BK_K, BK_K + 1):
            c = c + w[abs(j)] * float(y[t + j])
        num = num + c * c
        mids.append(y[t])
    m = len(mids)
    fm = float(m)
    sy = sum(mids)
    syy = sum(v * v for v in mids)
    cycle_var = num / fm
    yvar = float(m * syy - sy * sy) / (fm * fm)
    return m, cycle_var, cycle_var / yvar


def between_within(su, sxx, d):
    """(u, n, between_share, f_stat, icc) from per-user sums."""
    u = len(su)
    n = u * d
    s = sum(su)
    ssu = sum(v * v for v in su)
    num_b = n * ssu - d * s * s          # = D*n * SSB
    num_t = n * sxx - s * s              # = n * SST
    num_w = d * sxx - ssu                # = D * SSW
    share = float(num_b) / float(d * num_t)
    f_stat = (float(num_b * (n - u))
              / (float(n * (u - 1)) * float(num_w)))
    # ICC(1,1) = (MSB - MSW)/(MSB + (D-1) MSW);
    # MSB = num_b/(D n (u-1)), MSW = num_w/(D (n-u)) -> clear D:
    msb = float(num_b) / (float(n) * float(u - 1))
    msw = float(num_w) / float(n - u)
    icc = (msb - msw) / (msb + (float(d) - 1.0) * msw)
    return u, n, share, f_stat, icc


# ----------------------------------------------- events_baxter_king
def _bk_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        m, cv, share = baxter_king([int(v) for v in e])
        return pa.table({
            "n_mid": pa.array([m], type=pa.int64()),
            "cycle_var": pa.array([cv], type=pa.float64()),
            "cycle_share": pa.array([share], type=pa.float64()),
        })

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
        SELECT g.day - (SELECT lo FROM span) AS t,
               CAST(coalesce(c.e, 0) AS BIGINT) AS y
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    bw AS (
        SELECT j,
               CASE WHEN j = 0
                    THEN (2.0 * pi() / {BK_PL} - 2.0 * pi()
                          / {BK_PH}) / pi()
                    ELSE (sin(2.0 * pi() / {BK_PL}
                              * CAST(j AS DOUBLE))
                          - sin(2.0 * pi() / {BK_PH}
                                * CAST(j AS DOUBLE)))
                         / (pi() * CAST(j AS DOUBLE)) END AS b
        FROM (SELECT CAST(unnest(generate_series(0, {BK_K}))
                          AS BIGINT) AS j)
    ),
    theta AS (
        SELECT -(list_reduce(list_prepend(
                    (SELECT b FROM bw WHERE j = 0),
                    list(2.0 * b ORDER BY j)),
                 (a, x) -> a + x)
                 / (2.0 * {float(BK_K)} + 1.0)) AS th
        FROM bw WHERE j >= 1
    ),
    w AS (
        SELECT j, b + (SELECT th FROM theta) AS w FROM bw
    ),
    offs AS (
        SELECT CAST(unnest(generate_series(-{BK_K}, {BK_K}))
                    AS BIGINT) AS j
    ),
    cyc AS (
        SELECT d.t,
               list_reduce(list_prepend(0.0e0,
                   list(w.w * CAST(d2.y AS DOUBLE)
                        ORDER BY offs.j)),
                   (a, x) -> a + x) AS c
        FROM d
        JOIN offs ON TRUE
        JOIN d d2 ON d2.t = d.t + offs.j
        JOIN w ON w.j = abs(offs.j)
        WHERE d.t >= {BK_K}
          AND d.t < (SELECT n FROM nn) - {BK_K}
        GROUP BY d.t
    ),
    num AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(c * c ORDER BY t)), (a, x) -> a + x)
                   AS num,
               CAST(count(*) AS BIGINT) AS m
        FROM cyc
    ),
    mid AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM d
        WHERE t >= {BK_K} AND t < (SELECT n FROM nn) - {BK_K}
    )
    SELECT num.m AS n_mid,
           num.num / CAST(num.m AS DOUBLE) AS cycle_var,
           (num.num / CAST(num.m AS DOUBLE))
           / (CAST(mid.m * mid.syy - mid.sy * mid.sy AS DOUBLE)
              / (CAST(mid.m AS DOUBLE) * CAST(mid.m AS DOUBLE)))
               AS cycle_share
    FROM num CROSS JOIN mid
    """
    return q, sql


# ------------------------------------------- events_between_within
def _panel_query():
    def q(sf_dir: str):
        import ray.data as rd

        from .queries import _num_read_blocks
        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "uid": pa.array([], type=pa.int64()),
                "day": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // US_PER_DAY
            key = uid * 1_000_000 + day
            uk, cnt = np.unique(key, return_counts=True)
            return pa.table({
                "uid": pa.array(uk // 1_000_000),
                "day": pa.array(uk % 1_000_000),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["uid", "day"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "uid": g.column("uid").cast(pa.int64()),
                "day": g.column("day").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        d = int(a["day"].max()) - int(a["day"].min()) + 1
        su = [int(v) for v in
              a.groupby("uid", sort=True)["cnt"].sum()]
        sxx = int((a["cnt"].to_numpy(np.int64) ** 2).sum())
        u, n, share, f_stat, icc = between_within(su, sxx, d)
        return pa.table({
            "n_users": pa.array([u], type=pa.int64()),
            "n_cells": pa.array([n], type=pa.int64()),
            "between_share": pa.array([share], type=pa.float64()),
            "f_user": pa.array([f_stat], type=pa.float64()),
            "icc11": pa.array([icc], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT user_id AS uid, epoch_us(ts) // {US_PER_DAY} AS day
        FROM events
    ),
    span AS (
        SELECT max(day) - min(day) + 1 AS d FROM ev
    ),
    per AS (
        SELECT uid, day, CAST(count(*) AS BIGINT) AS x
        FROM ev GROUP BY uid, day
    ),
    us AS (
        SELECT uid, CAST(sum(x) AS BIGINT) AS su
        FROM per GROUP BY uid
    ),
    agg AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM us) AS u,
               (SELECT CAST(sum(CAST(su AS HUGEINT) * su)
                            AS HUGEINT) FROM us) AS ssu,
               (SELECT CAST(sum(su) AS BIGINT) FROM us) AS s,
               (SELECT CAST(sum(CAST(x AS HUGEINT) * x)
                            AS HUGEINT) FROM per) AS sxx,
               (SELECT CAST(d AS BIGINT) FROM span) AS d
    ),
    f AS (
        SELECT u, d, u * d AS n,
               CAST(u * d AS HUGEINT) * ssu
                   - CAST(d AS HUGEINT) * s * s AS num_b,
               CAST(u * d AS HUGEINT) * sxx
                   - CAST(s AS HUGEINT) * s AS num_t,
               CAST(d AS HUGEINT) * sxx - ssu AS num_w
        FROM agg
    ),
    g AS (
        SELECT u, n,
               CAST(num_b AS DOUBLE)
                   / CAST(CAST(d AS HUGEINT) * num_t AS DOUBLE)
                   AS share,
               CAST(num_b * (n - u) AS DOUBLE)
               / (CAST(CAST(n AS HUGEINT) * (u - 1) AS DOUBLE)
                  * CAST(num_w AS DOUBLE)) AS f_stat,
               CAST(num_b AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(u - 1 AS DOUBLE))
                   AS msb,
               CAST(num_w AS DOUBLE) / CAST(n - u AS DOUBLE)
                   AS msw,
               CAST(d AS DOUBLE) AS fd
        FROM f
    )
    SELECT u AS n_users, n AS n_cells,
           share AS between_share,
           f_stat AS f_user,
           (msb - msw) / (msb + (fd - 1.0) * msw) AS icc11
    FROM g
    """
    return q, sql


def build_wave254_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_baxter_king",) + _bk_query()))
    add(*(("events_between_within",) + _panel_query()))
    return queries, oracles
