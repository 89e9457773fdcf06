"""Wave-128 queries: cohort retention matrix, Nelson-Aalen hazard.

- events_cohort_retention: the product-analytics cohort triangle.
  Cohort = a user's first active day; the cell (cohort, offset)
  counts distinct users active offset days later. The per-user
  reduction (first day + distinct active days) runs inside the
  user-bucketed groupby (one user never spans groups); everything
  that leaves a task is a bounded (cohort_day, offset) count cell.
  The retention rate divides two identical ints (cell / cohort
  size at offset 0) once.
- events_nelson_aalen: Nelson-Aalen cumulative-hazard estimator for
  time-to-first-error (censored at a user's last event), with its
  variance sum d/n^2. Per-tau n_at_risk and deaths are exact
  integers from the same bounded survival histogram as the wave-124
  log-rank; the cumulative columns are PREFIXES of a left fold in
  tau order — the engine keeps a running sum while the oracle
  re-folds list_reduce per row, which is bitwise-identical because
  a left fold's prefix equals the fold of the prefix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


# ----------------------------------------------------- events_cohort_retention
def _cohort_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "user_id": t.column("user_id"),
                "day": pa.array(tus // US_PER_DAY),
            })

        def cells(g: pa.Table) -> pa.Table:
            # vectorized: unique (user, day), per-user first day via
            # segment starts, (cohort, offset) counts via lexsort +
            # run length — exact int replacement of the Counter loop
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            day = g.column("day").to_numpy(zero_copy_only=False)
            order = np.lexsort((day, u))
            u_s, d_s = u[order], day[order]
            keep = np.r_[True, (u_s[1:] != u_s[:-1])
                         | (d_s[1:] != d_s[:-1])]
            u_s, d_s = u_s[keep], d_s[keep]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            seg_len = np.diff(np.r_[starts, u_s.size])
            firsts = np.repeat(d_s[starts], seg_len)
            offs = d_s - firsts
            o2 = np.lexsort((offs, firsts))
            f2, of2 = firsts[o2], offs[o2]
            pstarts = np.flatnonzero(
                np.r_[True, (f2[1:] != f2[:-1])
                      | (of2[1:] != of2[:-1])]
            )
            users = np.diff(np.r_[pstarts, f2.size]).astype(np.int64)
            return pa.table({
                "cohort_day": pa.array(f2[pstarts], type=pa.int64()),
                "offset": pa.array(of2[pstarts], type=pa.int64()),
                "users": pa.array(users),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["cohort_day", "offset"]).aggregate(
                [("users", "sum")])
            return pa.table({
                "cohort_day": g.column("cohort_day").cast(
                    pa.int64()),
                "offset": g.column("offset").cast(pa.int64()),
                "users": g.column("users_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(cells, batch_format="pyarrow")
            .to_arrow_refs()
        )
        m = tree_reduce_tables(refs, merge).to_pandas()
        m = m.sort_values(["cohort_day", "offset"]).reset_index(
            drop=True)
        size = m[m["offset"] == 0].set_index("cohort_day")[
            "users"]
        rate = [float(u) / float(size.loc[c])
                for c, u in zip(m["cohort_day"], m["users"])]
        return pa.table({
            "cohort_day": pa.array(
                m["cohort_day"].to_numpy(np.int64)),
            "offset": pa.array(m["offset"].to_numpy(np.int64)),
            "users": pa.array(m["users"].to_numpy(np.int64)),
            "rate": pa.array(rate, type=pa.float64()),
        })

    sql = f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {US_PER_DAY} AS day
        FROM events
    ),
    fd AS (
        SELECT user_id, min(day) AS f FROM ud GROUP BY user_id
    ),
    cells AS (
        SELECT fd.f AS cohort_day, ud.day - fd.f AS "offset",
               CAST(count(*) AS BIGINT) AS users
        FROM ud JOIN fd ON fd.user_id = ud.user_id
        GROUP BY 1, 2
    ),
    base AS (
        SELECT cohort_day, users AS size
        FROM cells WHERE "offset" = 0
    )
    SELECT c.cohort_day AS cohort_day,
           c."offset" AS "offset",
           c.users AS users,
           CAST(c.users AS DOUBLE) / CAST(b.size AS DOUBLE)
               AS rate
    FROM cells c JOIN base b ON b.cohort_day = c.cohort_day
    ORDER BY 1, 2
    """
    return q, sql


# ------------------------------------------------------- events_nelson_aalen
def _nelson_aalen_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables
        from .queries_ext import _add_user_bucket

        def prep(t: pa.Table) -> pa.Table:
            return pa.table(
                {"user_id": t.column("user_id"),
                 "tus": t.column("ts").cast(pa.int64()),
                 "event_type": t.column("event_type")}
            )

        def surv(g: pa.Table) -> pa.Table:
            # per-user min/max via reduceat over the user-sorted rows;
            # error-min via +inf masking — exact int replacement
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            is_err = et == "error"
            order = np.argsort(u, kind="stable")
            u_s = u[order]
            t_s = tus[order]
            err_s = is_err[order]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            t0 = np.minimum.reduceat(t_s, starts)
            tmax = np.maximum.reduceat(t_s, starts)
            BIG = np.int64(1) << 62
            t_err = np.where(err_s, t_s, BIG)
            emin = np.minimum.reduceat(t_err, starts)
            has_err = emin < BIG
            dur = np.where(
                has_err,
                (emin - t0) // US_PER_HOUR,
                (tmax - t0) // US_PER_HOUR,
            )
            e = has_err.astype(np.int64)
            o2 = np.lexsort((e, dur))
            d2, e2 = dur[o2], e[o2]
            pstarts = np.flatnonzero(
                np.r_[True, (d2[1:] != d2[:-1])
                      | (e2[1:] != e2[:-1])]
            )
            c = np.diff(np.r_[pstarts, d2.size]).astype(np.int64)
            return pa.table({
                "dur": pa.array(d2[pstarts], type=pa.int64()),
                "e": pa.array(e2[pstarts], type=pa.int64()),
                "c": pa.array(c),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["dur", "e"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "dur": g.column("dur").cast(pa.int64()),
                "e": g.column("e").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(surv, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()

        n_total = int(h["c"].sum())
        # rows at each duration (event or censored), deaths only
        at = h.groupby("dur")["c"].sum()
        de = h[h["e"] == 1].groupby("dur")["c"].sum()
        taus = sorted(int(x) for x in de.index)

        out_t, out_n, out_d, out_h, out_v = [], [], [], [], []
        hc = 0.0
        vc = 0.0
        for tau in taus:
            n_risk = n_total - int(
                at[at.index < tau].sum())
            d = int(de.loc[tau])
            hc = hc + float(d) / float(n_risk)
            vc = vc + float(d) / (float(n_risk)
                                  * float(n_risk))
            out_t.append(tau)
            out_n.append(n_risk)
            out_d.append(d)
            out_h.append(hc)
            out_v.append(vc)
        return pa.table({
            "tau": pa.array(out_t, type=pa.int64()),
            "n_risk": pa.array(out_n, type=pa.int64()),
            "deaths": pa.array(out_d, type=pa.int64()),
            "h_cum": pa.array(out_h, type=pa.float64()),
            "var_cum": pa.array(out_v, type=pa.float64()),
        })

    sql = f"""
    WITH peru AS (
        SELECT user_id,
               min(epoch_us(ts)) AS t0,
               min(CASE WHEN event_type = 'error'
                   THEN epoch_us(ts) END) AS te,
               max(epoch_us(ts)) AS tl
        FROM events GROUP BY user_id
    ),
    rows_ AS (
        SELECT CASE WHEN te IS NOT NULL
                    THEN (te - t0) // {US_PER_HOUR}
                    ELSE (tl - t0) // {US_PER_HOUR} END AS dur,
               CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM peru
    ),
    terms AS (
        SELECT d.dur AS tau,
               (SELECT CAST(count(*) AS BIGINT) FROM rows_ r
                WHERE r.dur >= d.dur) AS n_risk,
               CAST(count(*) AS BIGINT) AS deaths
        FROM rows_ d WHERE d.e = 1 GROUP BY d.dur
    )
    SELECT t1.tau AS tau,
           t1.n_risk AS n_risk,
           t1.deaths AS deaths,
           (SELECT list_reduce(list_prepend(0.0e0,
                list(CAST(t2.deaths AS DOUBLE)
                     / CAST(t2.n_risk AS DOUBLE)
                     ORDER BY t2.tau)),
                (x, y) -> x + y)
            FROM terms t2 WHERE t2.tau <= t1.tau) AS h_cum,
           (SELECT list_reduce(list_prepend(0.0e0,
                list(CAST(t2.deaths AS DOUBLE)
                     / (CAST(t2.n_risk AS DOUBLE)
                        * CAST(t2.n_risk AS DOUBLE))
                     ORDER BY t2.tau)),
                (x, y) -> x + y)
            FROM terms t2 WHERE t2.tau <= t1.tau) AS var_cum
    FROM terms t1
    ORDER BY t1.tau
    """
    return q, sql


def build_wave128_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_cohort_retention",) + _cohort_query()))
    add(*(("events_nelson_aalen",) + _nelson_aalen_query()))
    return queries, oracles
