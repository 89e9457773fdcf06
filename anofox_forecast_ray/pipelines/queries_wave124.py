"""Wave-124 queries: log-rank survival test, KMV distinct sketch.

- events_logrank: two-cohort log-rank test on time-to-first-error.
  Users are split by a multiplicative-hash bit (NOT id parity — the
  corpus assigns ids by residue), survival time is hours from a
  user's first event to their first error (censored at the last
  event when no error occurs). The per-user reduction runs inside
  the bucketed groupby (one user never spans groups); everything
  that leaves a task is a bounded (cohort, duration, event) count
  histogram. The E1/V folds walk death times in ascending order with
  spelled-out float op order, so DuckDB's list_reduce replays them
  bitwise.
- orders_kmv_distinct: the KMV (bottom-k) distinct-count sketch —
  the mergeable theta-sketch shape used for cheap COUNT DISTINCT at
  100 TB. Per order priority, hash the integer total-price cents
  with a multiplicative hash mod 2^32, keep the k=32 smallest
  distinct hashes (a bounded, mergeable partial), and estimate
  (k-1) * 2^32 / h_k. Reported next to the exact distinct count and
  the relative error; groups with fewer than k hashes fall back to
  the exact count (the standard KMV rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

HASH_A = 2654435761
KMV_K = 32
US_PER_HOUR = 3_600_000_000


# ------------------------------------------------------------ events_logrank
def _logrank_query():
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
            # per-user reduceat mins/maxes + (group, dur, event) counts
            # via lexsort run-length — exact int replacement
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            is_err = et == "error"
            order = np.argsort(u, kind="stable")
            u_s, t_s, e_s = u[order], tus[order], is_err[order]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            t0 = np.minimum.reduceat(t_s, starts)
            tmax = np.maximum.reduceat(t_s, starts)
            BIG = np.int64(1) << 62
            emin = np.minimum.reduceat(
                np.where(e_s, t_s, BIG), starts
            )
            has = emin < BIG
            dur = np.where(has, (emin - t0) // US_PER_HOUR,
                           (tmax - t0) // US_PER_HOUR)
            e = has.astype(np.int64)
            uid = u_s[starts]
            # uint64 keeps the product exact (uid, HASH_A < 2^32 so
            # uid*HASH_A < 2^64); matches the Python-int arithmetic
            gb = (((uid.astype(np.uint64) * np.uint64(HASH_A))
                   % np.uint64(1 << 32)) >> np.uint64(31)).astype(
                np.int64
            )
            o2 = np.lexsort((e, dur, gb))
            g2, d2, e2 = gb[o2], dur[o2], e[o2]
            pstarts = np.flatnonzero(
                np.r_[True, (g2[1:] != g2[:-1])
                      | (d2[1:] != d2[:-1]) | (e2[1:] != e2[:-1])]
            )
            c = np.diff(np.r_[pstarts, g2.size]).astype(np.int64)
            return pa.table({
                "g": pa.array(g2[pstarts], type=pa.int64()),
                "dur": pa.array(d2[pstarts], type=pa.int64()),
                "e": pa.array(e2[pstarts], type=pa.int64()),
                "c": pa.array(c),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["g", "dur", "e"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "g": g.column("g").cast(pa.int64()),
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

        n_users = {0: 0, 1: 0}
        deaths = {}   # (g, dur) -> d
        allrow = {}   # (g, dur) -> total count (event + censored)
        for _, r in h.iterrows():
            gb, dur, e, c = (int(r["g"]), int(r["dur"]),
                             int(r["e"]), int(r["c"]))
            n_users[gb] += c
            allrow[(gb, dur)] = allrow.get((gb, dur), 0) + c
            if e == 1:
                deaths[(gb, dur)] = deaths.get((gb, dur), 0) + c
        death_times = sorted({d for (_g, d) in deaths})
        o1 = sum(c for (gb, _d), c in deaths.items() if gb == 1)
        n_tot = sum(c for (gb, _d), c in deaths.items())
        e1 = 0.0
        v = 0.0
        for tau in death_times:
            n0 = n_users[0] - sum(
                c for (gb, d), c in allrow.items()
                if gb == 0 and d < tau)
            n1 = n_users[1] - sum(
                c for (gb, d), c in allrow.items()
                if gb == 1 and d < tau)
            d0 = deaths.get((0, tau), 0)
            d1 = deaths.get((1, tau), 0)
            nd = n0 + n1
            d = d0 + d1
            e1 = e1 + float(d) * float(n1) / float(nd)
            if nd > 1:
                v = v + (float(d) * float(n1) / float(nd)) \
                    * (float(n0) / float(nd)) \
                    * (float(nd - d) / float(nd - 1))
        chi2 = ((float(o1) - e1) * (float(o1) - e1)) / v
        return pa.table({
            "n0_users": pa.array([n_users[0]], type=pa.int64()),
            "n1_users": pa.array([n_users[1]], type=pa.int64()),
            "deaths": pa.array([n_tot], type=pa.int64()),
            "o1": pa.array([o1], type=pa.int64()),
            "e1": pa.array([e1], type=pa.float64()),
            "v_lr": pa.array([v], type=pa.float64()),
            "chi2": pa.array([chi2], type=pa.float64()),
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
        SELECT ((user_id * {HASH_A}) % 4294967296)
                   // 2147483648 AS g,
               CASE WHEN te IS NOT NULL
                    THEN (te - t0) // {US_PER_HOUR}
                    ELSE (tl - t0) // {US_PER_HOUR} END AS dur,
               CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS e
        FROM peru
    ),
    times AS (
        SELECT DISTINCT dur FROM rows_ WHERE e = 1
    ),
    terms AS (
        SELECT t.dur,
               (SELECT CAST(COALESCE(count(*), 0) AS BIGINT)
                FROM rows_ r WHERE r.g = 0 AND r.dur >= t.dur)
                   AS n0,
               (SELECT CAST(COALESCE(count(*), 0) AS BIGINT)
                FROM rows_ r WHERE r.g = 1 AND r.dur >= t.dur)
                   AS n1,
               (SELECT CAST(COALESCE(count(*), 0) AS BIGINT)
                FROM rows_ r
                WHERE r.g = 0 AND r.e = 1 AND r.dur = t.dur) AS d0,
               (SELECT CAST(COALESCE(count(*), 0) AS BIGINT)
                FROM rows_ r
                WHERE r.g = 1 AND r.e = 1 AND r.dur = t.dur) AS d1
        FROM times t
    ),
    e1f AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(d0 + d1 AS DOUBLE)
                        * CAST(n1 AS DOUBLE)
                        / CAST(n0 + n1 AS DOUBLE)
                        ORDER BY dur)),
                   (a, b) -> a + b) AS e1
        FROM terms
    ),
    vf AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CAST(d0 + d1 AS DOUBLE)
                        * CAST(n1 AS DOUBLE)
                        / CAST(n0 + n1 AS DOUBLE)
                        * (CAST(n0 AS DOUBLE)
                           / CAST(n0 + n1 AS DOUBLE))
                        * (CAST(n0 + n1 - d0 - d1 AS DOUBLE)
                           / CAST(n0 + n1 - 1 AS DOUBLE))
                        ORDER BY dur)),
                   (a, b) -> a + b) AS v
        FROM terms WHERE n0 + n1 > 1
    ),
    tot AS (
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM rows_
             WHERE g = 0) AS n0_users,
            (SELECT CAST(count(*) AS BIGINT) FROM rows_
             WHERE g = 1) AS n1_users,
            (SELECT CAST(COALESCE(sum(e), 0) AS BIGINT)
             FROM rows_) AS deaths,
            (SELECT CAST(COALESCE(sum(e), 0) AS BIGINT)
             FROM rows_ WHERE g = 1) AS o1
    )
    SELECT tot.n0_users AS n0_users,
           tot.n1_users AS n1_users,
           tot.deaths AS deaths,
           tot.o1 AS o1,
           e1f.e1 AS e1,
           vf.v AS v_lr,
           (CAST(tot.o1 AS DOUBLE) - e1f.e1)
               * (CAST(tot.o1 AS DOUBLE) - e1f.e1) / vf.v AS chi2
    FROM tot, e1f, vf
    """
    return q, sql


# ------------------------------------------------------- orders_kmv_distinct
def _kmv_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "prio": pa.array([], type=pa.string()),
                "cents": pa.array([], type=pa.int64()),
            })
            if ("o_totalprice" not in t.column_names
                    or t.num_rows == 0):
                return empty
            prio = np.asarray(t.column("o_orderpriority")
                              .to_pylist(), dtype=object)
            cents = np.round(t.column("o_totalprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
            # per-block distinct (prio, cents) pairs
            import collections
            seen = collections.defaultdict(set)
            for p, c in zip(prio, cents.tolist()):
                seen[p].add(c)
            out_p, out_c = [], []
            for p in sorted(seen):
                for c in sorted(seen[p]):
                    out_p.append(p)
                    out_c.append(c)
            return pa.table({
                "prio": pa.array(out_p, type=pa.string()),
                "cents": pa.array(out_c, type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["prio", "cents"]).aggregate([])
            return pa.table({
                "prio": g.column("prio").cast(pa.string()),
                "cents": g.column("cents").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        dd = tree_reduce_tables(refs, merge).to_pandas()

        out = {"prio": [], "n_exact": [], "n_hashes": [],
               "h_k": [], "est": [], "rel_err": []}
        for p in sorted(dd["prio"].unique()):
            cents = dd.loc[dd["prio"] == p, "cents"].to_numpy(
                np.int64)
            n_exact = int(cents.size)
            hs = np.unique((cents * np.int64(HASH_A))
                           % np.int64(1 << 32))
            n_h = int(hs.size)
            if n_h <= KMV_K:
                hk = int(hs[-1]) if n_h else 0
                est = float(n_h)
            else:
                hk = int(hs[KMV_K - 1])
                est = (float(KMV_K - 1) * 4294967296.0) \
                    / float(hk)
            out["prio"].append(p)
            out["n_exact"].append(n_exact)
            out["n_hashes"].append(n_h)
            out["h_k"].append(hk)
            out["est"].append(est)
            out["rel_err"].append(est / float(n_exact))
        return pa.table({
            "prio": pa.array(out["prio"], type=pa.string()),
            "n_exact": pa.array(out["n_exact"], type=pa.int64()),
            "n_hashes": pa.array(out["n_hashes"],
                                 type=pa.int64()),
            "h_k": pa.array(out["h_k"], type=pa.int64()),
            "est": pa.array(out["est"], type=pa.float64()),
            "rel_err": pa.array(out["rel_err"],
                                type=pa.float64()),
        })

    sql = f"""
    WITH dv AS (
        SELECT DISTINCT o_orderpriority AS prio,
               CAST(round_even(o_totalprice * 100, 0) AS BIGINT)
                   AS cents
        FROM orders
    ),
    hv AS (
        SELECT DISTINCT prio,
               (cents * {HASH_A}) % 4294967296 AS h
        FROM dv
    ),
    rk AS (
        SELECT prio, h,
               row_number() OVER (PARTITION BY prio ORDER BY h)
                   AS rn,
               CAST(count(*) OVER (PARTITION BY prio) AS BIGINT)
                   AS nh
        FROM hv
    ),
    per AS (
        SELECT prio,
               max(nh) AS n_hashes,
               CAST(max(CASE WHEN nh <= {KMV_K} AND rn = nh
                             THEN h
                             WHEN nh > {KMV_K} AND rn = {KMV_K}
                             THEN h END) AS BIGINT) AS h_k
        FROM rk GROUP BY prio
    ),
    ex AS (
        SELECT prio, CAST(count(*) AS BIGINT) AS n_exact
        FROM dv GROUP BY prio
    )
    SELECT per.prio AS prio,
           ex.n_exact AS n_exact,
           CAST(per.n_hashes AS BIGINT) AS n_hashes,
           COALESCE(per.h_k, 0) AS h_k,
           CASE WHEN per.n_hashes <= {KMV_K}
                THEN CAST(per.n_hashes AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE) * 4294967296.0e0
                     / CAST(per.h_k AS DOUBLE)
           END AS est,
           CASE WHEN per.n_hashes <= {KMV_K}
                THEN CAST(per.n_hashes AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE) * 4294967296.0e0
                     / CAST(per.h_k AS DOUBLE)
           END / CAST(ex.n_exact AS DOUBLE) AS rel_err
    FROM per JOIN ex ON ex.prio = per.prio
    ORDER BY per.prio
    """
    return q, sql


def build_wave124_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_logrank",) + _logrank_query()))
    add(*(("orders_kmv_distinct",) + _kmv_query()))
    return queries, oracles
