"""Wave-175 queries: jackknife variance, CUPED adjustment.

- events_jackknife_rate: the delete-one-DAY jackknife for the
  overall error rate — each leave-one-out replicate is a ratio of
  integer totals minus the day's cell, the pseudovalue variance
  folds days in order, and the jackknife SE is compared with the
  naive binomial SE (clustering by day inflates it).
- events_cuped: CUPED variance reduction for the cohort error-rate
  experiment — per user, the pre-period (first half of days)
  error rate is the covariate for the post-period rate;
  theta = cov(pre, post)/var(pre) from uid-ordered two-pass folds,
  the adjusted metric is post - theta*(pre - mean_pre), and the
  query reports the cohort difference before/after adjustment and
  the variance-reduction factor 1 - var(adj)/var(post).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
HASH_A = 2654435761


# ----------------------------------------------------- events_jackknife_rate
def _jackknife_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            day = tus // US_PER_DAY
            ud, inv = np.unique(day, return_inverse=True)
            n = np.bincount(inv, minlength=ud.size)
            k = np.bincount(inv[et == "error"],
                            minlength=ud.size)
            return pa.table({
                "day": pa.array(ud.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "k": pa.array(k.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate(
                [("n", "sum"), ("k", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "k": g.column("k_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("day").reset_index(drop=True)
        nt = int(h["n"].sum())
        kt = int(h["k"].sum())
        d = len(h)
        df = float(d)
        rate = float(kt) / float(nt)

        reps = []
        for _, r in h.iterrows():
            reps.append(float(kt - int(r["k"]))
                        / float(nt - int(r["n"])))
        mrep = 0.0
        for v in reps:
            mrep = mrep + v
        mrep = mrep / df
        ssq = 0.0
        for v in reps:
            dv = v - mrep
            ssq = ssq + dv * dv
        var_jk = ((df - 1.0) / df) * ssq
        se_jk = math.sqrt(var_jk)
        se_naive = math.sqrt(rate * (1.0 - rate)
                             / float(nt))
        return pa.table({
            "n_days": pa.array([d], type=pa.int64()),
            "rate": pa.array([rate], type=pa.float64()),
            "se_jackknife": pa.array([se_jk],
                                     type=pa.float64()),
            "se_naive": pa.array([se_naive],
                                 type=pa.float64()),
            "design_effect": pa.array(
                [var_jk / (rate * (1.0 - rate)
                           / float(nt))],
                type=pa.float64()),
        })

    sql = f"""
    WITH dc AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS d,
               CAST(sum(n) AS BIGINT) AS nt,
               CAST(sum(k) AS BIGINT) AS kt
        FROM dc
    ),
    mrep AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(tot.kt - dc.k AS DOUBLE)
                        / CAST(tot.nt - dc.n AS DOUBLE)
                        ORDER BY dc.day)),
                   (x, y) -> x + y)
                   / CAST(tot.d AS DOUBLE) AS m
        FROM dc CROSS JOIN tot GROUP BY tot.d
    ),
    ssq AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((CAST(tot.kt - dc.k AS DOUBLE)
                         / CAST(tot.nt - dc.n AS DOUBLE)
                         - mrep.m)
                        * (CAST(tot.kt - dc.k AS DOUBLE)
                           / CAST(tot.nt - dc.n AS DOUBLE)
                           - mrep.m)
                        ORDER BY dc.day)),
                   (x, y) -> x + y) AS s
        FROM dc CROSS JOIN tot CROSS JOIN mrep
        GROUP BY mrep.m
    )
    SELECT tot.d AS n_days,
           CAST(tot.kt AS DOUBLE) / CAST(tot.nt AS DOUBLE)
               AS rate,
           sqrt(((CAST(tot.d AS DOUBLE) - 1.0e0)
                 / CAST(tot.d AS DOUBLE)) * ssq.s)
               AS se_jackknife,
           sqrt((CAST(tot.kt AS DOUBLE)
                 / CAST(tot.nt AS DOUBLE))
                * (1.0e0 - CAST(tot.kt AS DOUBLE)
                   / CAST(tot.nt AS DOUBLE))
                / CAST(tot.nt AS DOUBLE)) AS se_naive,
           (((CAST(tot.d AS DOUBLE) - 1.0e0)
             / CAST(tot.d AS DOUBLE)) * ssq.s)
           / ((CAST(tot.kt AS DOUBLE)
               / CAST(tot.nt AS DOUBLE))
              * (1.0e0 - CAST(tot.kt AS DOUBLE)
                 / CAST(tot.nt AS DOUBLE))
              / CAST(tot.nt AS DOUBLE)) AS design_effect
    FROM tot CROSS JOIN ssq
    """
    return q, sql


# --------------------------------------------------------------- events_cuped
def _cuped_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "uid": pa.array([], type=pa.int64()),
                "half": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            day = tus // US_PER_DAY
            return pa.table({
                "uid": pa.array(uid),
                "half": pa.array(day),  # resolved on driver
                "n": pa.array(np.ones(len(uid),
                                      dtype=np.int64)),
                "k": pa.array((et == "error").astype(
                    np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["uid", "half"]).aggregate(
                [("n", "sum"), ("k", "sum")])
            return pa.table({
                "uid": g.column("uid").cast(pa.int64()),
                "half": g.column("half").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "k": g.column("k_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        dmin = int(cells["half"].min())
        dmax = int(cells["half"].max())
        dmid = dmin + (dmax - dmin + 1) // 2
        cells["h"] = (cells["half"] >= dmid).astype(int)
        agg = cells.groupby(["uid", "h"]).agg(
            n=("n", "sum"), k=("k", "sum"))

        users = sorted(set(
            int(u) for u, hh in agg.index if True))
        rows = []
        for u in users:
            try:
                n0, k0 = agg.loc[(u, 0)]
            except KeyError:
                continue
            try:
                n1, k1 = agg.loc[(u, 1)]
            except KeyError:
                continue
            pre = float(int(k0)) / float(int(n0))
            post = float(int(k1)) / float(int(n1))
            g = ((u * HASH_A) % (1 << 32)) >> 31
            rows.append((u, g, pre, post))

        nu = len(rows)
        nf = float(nu)
        mp = 0.0
        mq = 0.0
        for _u, _g, pre, post in rows:
            mp = mp + pre
            mq = mq + post
        mp = mp / nf
        mq = mq / nf
        spp = 0.0
        spq = 0.0
        sqq = 0.0
        for _u, _g, pre, post in rows:
            dp = pre - mp
            dq = post - mq
            spp = spp + dp * dp
            spq = spq + dp * dq
            sqq = sqq + dq * dq
        theta = spq / spp

        s_adj = 0.0
        d1 = d0 = 0.0
        n1c = n0c = 0
        a1 = a0 = 0.0
        var_adj = 0.0
        adjs = []
        for _u, g, pre, post in rows:
            adj = post - theta * (pre - mp)
            adjs.append((g, post, adj))
        for g, post, adj in adjs:
            if g == 1:
                n1c += 1
                d1 = d1 + post
                a1 = a1 + adj
            else:
                n0c += 1
                d0 = d0 + post
                a0 = a0 + adj
        diff_raw = d1 / float(n1c) - d0 / float(n0c)
        diff_adj = a1 / float(n1c) - a0 / float(n0c)
        madj = 0.0
        for _g, _post, adj in adjs:
            madj = madj + adj
        madj = madj / nf
        for _g, _post, adj in adjs:
            da = adj - madj
            var_adj = var_adj + da * da
        vr = 1.0 - var_adj / sqq
        return pa.table({
            "n_users": pa.array([nu], type=pa.int64()),
            "theta": pa.array([theta], type=pa.float64()),
            "diff_raw": pa.array([diff_raw],
                                 type=pa.float64()),
            "diff_cuped": pa.array([diff_adj],
                                   type=pa.float64()),
            "var_reduction": pa.array([vr],
                                      type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT user_id AS uid,
               epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0
                   END AS err
        FROM events
    ),
    spanx AS (
        SELECT min(day) AS dmin,
               min(day) + (max(day) - min(day) + 1) // 2
                   AS dmid
        FROM e
    ),
    per AS (
        SELECT uid,
               CASE WHEN day >= spanx.dmid THEN 1 ELSE 0 END
                   AS h,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(err) AS BIGINT) AS k
        FROM e CROSS JOIN spanx
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT a.uid,
               ((a.uid * {HASH_A}) % 4294967296)
                   // 2147483648 AS g,
               CAST(a.k AS DOUBLE) / CAST(a.n AS DOUBLE)
                   AS pre,
               CAST(b.k AS DOUBLE) / CAST(b.n AS DOUBLE)
                   AS post
        FROM per a JOIN per b
          ON b.uid = a.uid AND a.h = 0 AND b.h = 1
    ),
    mu AS (
        SELECT CAST(count(*) AS BIGINT) AS nu,
               list_reduce(list_prepend(0.0e0,
                   list(pre ORDER BY uid)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS mp,
               list_reduce(list_prepend(0.0e0,
                   list(post ORDER BY uid)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS mq
        FROM wide
    ),
    mom AS (
        SELECT mu.nu, mu.mp, mu.mq,
               list_reduce(list_prepend(0.0e0,
                   list((pre - mu.mp) * (pre - mu.mp)
                        ORDER BY uid)), (x, y) -> x + y)
                   AS spp,
               list_reduce(list_prepend(0.0e0,
                   list((pre - mu.mp) * (post - mu.mq)
                        ORDER BY uid)), (x, y) -> x + y)
                   AS spq,
               list_reduce(list_prepend(0.0e0,
                   list((post - mu.mq) * (post - mu.mq)
                        ORDER BY uid)), (x, y) -> x + y)
                   AS sqq
        FROM wide CROSS JOIN mu
        GROUP BY mu.nu, mu.mp, mu.mq
    ),
    adj AS (
        SELECT w.uid, w.g, w.post,
               w.post - (mom.spq / mom.spp)
                   * (w.pre - mom.mp) AS a
        FROM wide w CROSS JOIN mom
    ),
    madj AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(a ORDER BY uid)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS m
        FROM adj
    ),
    vadj AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list((a - madj.m) * (a - madj.m)
                        ORDER BY uid)), (x, y) -> x + y)
                   AS v
        FROM adj CROSS JOIN madj GROUP BY madj.m
    ),
    grp AS (
        SELECT
            CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
            CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n0,
            list_reduce(list_prepend(0.0e0,
                list(CASE WHEN g = 1 THEN post ELSE 0.0e0
                     END ORDER BY uid)), (x, y) -> x + y)
                AS d1,
            list_reduce(list_prepend(0.0e0,
                list(CASE WHEN g = 0 THEN post ELSE 0.0e0
                     END ORDER BY uid)), (x, y) -> x + y)
                AS d0,
            list_reduce(list_prepend(0.0e0,
                list(CASE WHEN g = 1 THEN a ELSE 0.0e0 END
                     ORDER BY uid)), (x, y) -> x + y) AS a1,
            list_reduce(list_prepend(0.0e0,
                list(CASE WHEN g = 0 THEN a ELSE 0.0e0 END
                     ORDER BY uid)), (x, y) -> x + y) AS a0
        FROM adj
    )
    SELECT mom.nu AS n_users,
           mom.spq / mom.spp AS theta,
           grp.d1 / CAST(grp.n1 AS DOUBLE)
               - grp.d0 / CAST(grp.n0 AS DOUBLE)
               AS diff_raw,
           grp.a1 / CAST(grp.n1 AS DOUBLE)
               - grp.a0 / CAST(grp.n0 AS DOUBLE)
               AS diff_cuped,
           1.0e0 - vadj.v / mom.sqq AS var_reduction
    FROM mom CROSS JOIN grp CROSS JOIN vadj
    """
    return q, sql


def build_wave175_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_jackknife_rate",) + _jackknife_query()))
    add(*(("events_cuped",) + _cuped_query()))
    return queries, oracles
