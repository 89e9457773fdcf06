"""Wave-156 queries: competing risks, Qini uplift curve.

- events_competing_risks: Aalen-Johansen cumulative incidence
  functions for two COMPETING first events — does a user hit an
  'error' or a 'purchase' first? Per-tau risk sets and cause-
  specific death counts are exact integers from the same bounded
  survival histogram as the KM/NA queries; the overall KM survival
  is a multiplicative prefix fold, each CIF is an additive prefix
  fold of S(tau-) * d_k/n, and the oracle re-folds both per row
  (prefix of a fold == fold of the prefix). The two CIFs + overall
  survival sum to 1 minus the censoring mass — checked in the
  brute.
- events_qini_uplift: the Qini curve for cohort uplift ranked by
  user activity — per decile (exact ceil(kU/10) boundaries over
  (activity desc, uid) order), cumulative treated/control errors
  and the Qini value q_d = e1 - e0 * n1/n0. The last row's q is
  the total incremental-error estimate; all counts integer, one
  division per decile.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
HASH_A = 2654435761


# --------------------------------------------------- events_competing_risks
def _competing_query():
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
            # competing-risks per-user mins via two masked reduceats;
            # (dur, ev) counts via lexsort run length — exact
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            tus = g.column("tus").to_numpy(zero_copy_only=False)
            et = np.asarray(g.column("event_type").to_pylist(),
                            dtype=object)
            is_err = et == "error"
            is_pur = et == "purchase"
            order = np.argsort(u, kind="stable")
            u_s, t_s = u[order], tus[order]
            err_s, pur_s = is_err[order], is_pur[order]
            starts = np.flatnonzero(
                np.r_[True, u_s[1:] != u_s[:-1]]
            )
            BIG = np.int64(1) << 62
            t0 = np.minimum.reduceat(t_s, starts)
            tmax = np.maximum.reduceat(t_s, starts)
            te = np.minimum.reduceat(
                np.where(err_s, t_s, BIG), starts
            )
            tp = np.minimum.reduceat(
                np.where(pur_s, t_s, BIG), starts
            )
            has_e = te < BIG
            has_p = tp < BIG
            err_wins = has_e & (~has_p | (te <= tp))
            pur_wins = has_p & ~err_wins
            dur = np.where(
                err_wins, (te - t0) // US_PER_HOUR,
                np.where(pur_wins, (tp - t0) // US_PER_HOUR,
                         (tmax - t0) // US_PER_HOUR),
            )
            ev = np.where(err_wins, 1,
                          np.where(pur_wins, 2, 0)).astype(np.int64)
            o2 = np.lexsort((ev, dur))
            d2, e2 = dur[o2], ev[o2]
            pstarts = np.flatnonzero(
                np.r_[True, (d2[1:] != d2[:-1])
                      | (e2[1:] != e2[:-1])]
            )
            c = np.diff(np.r_[pstarts, d2.size]).astype(np.int64)
            return pa.table({
                "dur": pa.array(d2[pstarts], type=pa.int64()),
                "ev": pa.array(e2[pstarts], type=pa.int64()),
                "c": pa.array(c),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["dur", "ev"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "dur": g.column("dur").cast(pa.int64()),
                "ev": g.column("ev").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(prep, batch_format="pyarrow")
            .map_batches(_add_user_bucket,
                         batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(surv, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        n_total = int(h["c"].sum())
        at = h.groupby("dur")["c"].sum()
        de = h[h["ev"] == 1].groupby("dur")["c"].sum()
        dp = h[h["ev"] == 2].groupby("dur")["c"].sum()
        taus = sorted(set(int(x) for x in de.index)
                      | set(int(x) for x in dp.index))

        out = {"tau": [], "n_risk": [], "d_err": [],
               "d_pur": [], "cif_err": [], "cif_pur": []}
        s_km = 1.0
        c1 = 0.0
        c2 = 0.0
        for tau in taus:
            n_risk = n_total - int(at[at.index < tau].sum())
            d1 = int(de.loc[tau]) if tau in de.index else 0
            d2 = int(dp.loc[tau]) if tau in dp.index else 0
            c1 = c1 + s_km * (float(d1) / float(n_risk))
            c2 = c2 + s_km * (float(d2) / float(n_risk))
            s_km = s_km * (1.0 - float(d1 + d2)
                           / float(n_risk))
            out["tau"].append(tau)
            out["n_risk"].append(n_risk)
            out["d_err"].append(d1)
            out["d_pur"].append(d2)
            out["cif_err"].append(c1)
            out["cif_pur"].append(c2)
        return pa.table({
            "tau": pa.array(out["tau"], type=pa.int64()),
            "n_risk": pa.array(out["n_risk"],
                               type=pa.int64()),
            "d_err": pa.array(out["d_err"], type=pa.int64()),
            "d_pur": pa.array(out["d_pur"], type=pa.int64()),
            "cif_err": pa.array(out["cif_err"],
                                type=pa.float64()),
            "cif_pur": pa.array(out["cif_pur"],
                                type=pa.float64()),
        })

    sql = f"""
    WITH peru AS (
        SELECT user_id,
               min(epoch_us(ts)) AS t0,
               min(CASE WHEN event_type = 'error'
                   THEN epoch_us(ts) END) AS te,
               min(CASE WHEN event_type = 'purchase'
                   THEN epoch_us(ts) END) AS tp,
               max(epoch_us(ts)) AS tl
        FROM events GROUP BY user_id
    ),
    rows_ AS (
        SELECT CASE
                 WHEN te IS NOT NULL
                      AND (tp IS NULL OR te <= tp)
                 THEN (te - t0) // {US_PER_HOUR}
                 WHEN tp IS NOT NULL
                 THEN (tp - t0) // {US_PER_HOUR}
                 ELSE (tl - t0) // {US_PER_HOUR}
               END AS dur,
               CASE
                 WHEN te IS NOT NULL
                      AND (tp IS NULL OR te <= tp) THEN 1
                 WHEN tp IS NOT NULL THEN 2
                 ELSE 0
               END AS ev
        FROM peru
    ),
    terms AS (
        SELECT d.dur AS tau,
               (SELECT CAST(count(*) AS BIGINT) FROM rows_ r
                WHERE r.dur >= d.dur) AS n_risk,
               CAST(COALESCE(sum(CASE WHEN d.ev = 1
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS d1,
               CAST(COALESCE(sum(CASE WHEN d.ev = 2
                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS d2
        FROM rows_ d WHERE d.ev IN (1, 2) GROUP BY d.dur
    )
    SELECT t1.tau AS tau,
           t1.n_risk AS n_risk,
           t1.d1 AS d_err,
           t1.d2 AS d_pur,
           (SELECT list_reduce(list_prepend([1.0e0, 0.0e0],
                list_transform(
                    list([CAST(t2.d1 AS DOUBLE),
                          CAST(t2.d2 AS DOUBLE),
                          CAST(t2.n_risk AS DOUBLE)]
                         ORDER BY t2.tau),
                    v -> [v[1], 0.0e0, v[2], v[3]])),
                (acc, e) -> [
                    acc[1] * (1.0e0 - (e[1] + e[3])
                              / e[4]),
                    acc[2] + acc[1] * (e[1] / e[4])])
            FROM terms t2 WHERE t2.tau <= t1.tau)[2]
               AS cif_err,
           (SELECT list_reduce(list_prepend([1.0e0, 0.0e0],
                list_transform(
                    list([CAST(t2.d1 AS DOUBLE),
                          CAST(t2.d2 AS DOUBLE),
                          CAST(t2.n_risk AS DOUBLE)]
                         ORDER BY t2.tau),
                    v -> [v[1], 0.0e0, v[2], v[3]])),
                (acc, e) -> [
                    acc[1] * (1.0e0 - (e[1] + e[3])
                              / e[4]),
                    acc[2] + acc[1] * (e[3] / e[4])])
            FROM terms t2 WHERE t2.tau <= t1.tau)[2]
               AS cif_pur
    FROM terms t1
    ORDER BY t1.tau
    """
    return q, sql


# ------------------------------------------------------- events_qini_uplift
def _qini_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "uid": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            uu, inv = np.unique(uid, return_inverse=True)
            n = np.bincount(inv, minlength=uu.size)
            k = np.bincount(inv[et == "error"],
                            minlength=uu.size)
            return pa.table({
                "uid": pa.array(uu.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "k": pa.array(k.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("uid").aggregate(
                [("n", "sum"), ("k", "sum")])
            return pa.table({
                "uid": g.column("uid").cast(pa.int64()),
                "n": g.column("n_sum").cast(pa.int64()),
                "k": g.column("k_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        u = tree_reduce_tables(refs, merge).to_pandas()
        u["g"] = ((u["uid"].to_numpy(np.int64)
                   * np.int64(HASH_A)) % np.int64(1 << 32)) \
            >> np.int64(31)
        u = u.sort_values(["n", "uid"],
                          ascending=[False, True]).\
            reset_index(drop=True)
        nu = len(u)

        out = {"decile": [], "n1": [], "e1": [], "n0": [],
               "e0": [], "qini": []}
        for d in range(1, 11):
            cut = (d * nu + 9) // 10  # ceil(d*U/10)
            top = u.iloc[:cut]
            n1 = int((top["g"] == 1).sum())
            n0 = int((top["g"] == 0).sum())
            e1 = int(top.loc[top["g"] == 1, "k"].sum())
            e0 = int(top.loc[top["g"] == 0, "k"].sum())
            qini = float(e1) - float(e0) \
                * (float(n1) / float(n0))
            out["decile"].append(d)
            out["n1"].append(n1)
            out["e1"].append(e1)
            out["n0"].append(n0)
            out["e0"].append(e0)
            out["qini"].append(qini)
        return pa.table({
            "decile": pa.array(out["decile"],
                               type=pa.int64()),
            "n1": pa.array(out["n1"], type=pa.int64()),
            "e1": pa.array(out["e1"], type=pa.int64()),
            "n0": pa.array(out["n0"], type=pa.int64()),
            "e0": pa.array(out["e0"], type=pa.int64()),
            "qini": pa.array(out["qini"],
                             type=pa.float64()),
        })

    sql = f"""
    WITH u AS (
        SELECT user_id AS uid,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS k,
               ((user_id * {HASH_A}) % 4294967296)
                   // 2147483648 AS g
        FROM events GROUP BY user_id
    ),
    rk AS (
        SELECT *, row_number() OVER (
                   ORDER BY n DESC, uid ASC) AS r
        FROM u
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
    dec AS (
        SELECT d.d,
               (d.d * nn.nu + 9) // 10 AS cut
        FROM (SELECT unnest(generate_series(1, 10)) AS d) d
        CROSS JOIN nn
    ),
    cum AS (
        SELECT dec.d,
               CAST(sum(CASE WHEN rk.g = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN rk.g = 1
                        THEN rk.k ELSE 0 END) AS BIGINT)
                   AS e1,
               CAST(sum(CASE WHEN rk.g = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN rk.g = 0
                        THEN rk.k ELSE 0 END) AS BIGINT)
                   AS e0
        FROM dec JOIN rk ON rk.r <= dec.cut
        GROUP BY dec.d
    )
    SELECT d AS decile, n1, e1, n0, e0,
           CAST(e1 AS DOUBLE)
               - CAST(e0 AS DOUBLE)
                 * (CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE))
               AS qini
    FROM cum
    ORDER BY d
    """
    return q, sql


def build_wave156_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_competing_risks",) + _competing_query()))
    add(*(("events_qini_uplift",) + _qini_query()))
    return queries, oracles
