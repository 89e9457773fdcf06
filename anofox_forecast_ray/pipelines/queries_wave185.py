"""Wave-185 queries: restricted mean survival time, Harrell's C-index.

Survival-analysis completion over the days-until-first-purchase data
(same per-user collapse and censor-at-last-event convention as
events_km_survival, wave 42):

- events_rmst: RMST(tau) = integral of the KM step curve from 0 to
  tau = max observed day — "expected purchase-free days within the
  window". One 3-slot LIST fold [area, s, prev] over death days in
  ascending order: area += s * (t - prev); s *= 1 - d/n; plus the
  censored tail s * (tau - prev). Every factor is a single division
  of exact ints; day gaps are exact integers.
- events_harrell_c: concordance of the risk score (= user's total
  event count; busier users buy sooner?) with observed time-to-
  purchase under right censoring. A pair is comparable iff durations
  differ and the shorter-duration user had the event; concordant iff
  that user also has the HIGHER risk score; score ties count half:
  C = (2*conc + tied) / (2*comp) — all int64 pair counts from the
  bounded per-user table, one division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

DAY_US = 86_400_000_000

_SQL_USERS = """
    u AS (
        SELECT user_id,
               min(epoch_us(ts)) AS first_ts,
               max(epoch_us(ts)) AS last_ts,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS first_p,
               CAST(count(*) AS BIGINT) AS n_ev
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT user_id, n_ev,
               CASE WHEN first_p IS NOT NULL
                    THEN (first_p - first_ts) // 86400000000
                    ELSE (last_ts - first_ts) // 86400000000
               END AS day,
               CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS d
        FROM u
    )
"""


def _user_table(sf_dir: str):
    """Per-user (dur_day, event, n_ev) rows via bucketed merge."""
    import pandas as pd
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_id": pa.array([], type=pa.int64()),
             "first_ts": pa.array([], type=pa.int64()),
             "last_ts": pa.array([], type=pa.int64()),
             "first_p": pa.array([], type=pa.int64()),
             "n_ev": pa.array([], type=pa.int64())}
        )
        if "user_id" not in t.column_names or t.num_rows == 0:
            return empty
        et = np.asarray(t.column("event_type").to_pylist())
        df = pa.table(
            {"user_id": t.column("user_id").cast(pa.int64()),
             "tus": t.column("ts").cast(pa.int64()),
             "is_p": pa.array((et == "purchase").astype(np.int8),
                              type=pa.int8())}
        ).to_pandas()
        BIG = np.int64(1) << 62
        df["first_p"] = np.where(df["is_p"] == 1, df["tus"], BIG)
        a = (df.groupby("user_id")
             .agg(first_ts=("tus", "min"), last_ts=("tus", "max"),
                  first_p=("first_p", "min"),
                  n_ev=("tus", "size")).reset_index())
        a["n_ev"] = a["n_ev"].astype("int64")
        return pa.Table.from_pandas(a, preserve_index=False)

    def merge_bucket(g: pa.Table) -> pa.Table:
        a = g.group_by("user_id").aggregate(
            [("first_ts", "min"), ("last_ts", "max"),
             ("first_p", "min"), ("n_ev", "sum")]
        )
        BIG = np.int64(1) << 62
        first = a.column("first_ts_min").to_numpy(
            zero_copy_only=False)
        last = a.column("last_ts_max").to_numpy(
            zero_copy_only=False)
        fp = a.column("first_p_min").to_numpy(zero_copy_only=False)
        event = fp < BIG
        day = np.where(event, (fp - first) // DAY_US,
                       (last - first) // DAY_US).astype(np.int64)
        return pa.table(
            {"user_id": a.column("user_id").cast(pa.int64()),
             "day": pa.array(day),
             "d": pa.array(event.astype(np.int64)),
             "n_ev": a.column("n_ev_sum").cast(pa.int64())}
        )

    def concat(t: pa.Table) -> pa.Table:
        return t

    refs = list(
        read_cols(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .map_batches(_add_user_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
        .to_arrow_refs()
    )
    return tree_reduce_tables(refs, concat).to_pandas()


# ------------------------------------------------------------ events_rmst
def _rmst_query():
    def q(sf_dir: str):
        u = _user_table(sf_dir)
        tau = int(u["day"].max())
        n_users = len(u)
        byday = (u.groupby("day")
                 .agg(d=("d", "sum"), removed=("d", "size"))
                 .reset_index().sort_values("day"))
        days = byday["day"].to_numpy(np.int64)
        d = byday["d"].to_numpy(np.int64)
        removed = byday["removed"].to_numpy(np.int64)
        before = np.concatenate(([0], np.cumsum(removed)[:-1]))
        at_risk = n_users - before
        area = 0.0
        s = 1.0
        prev = 0.0
        for i in range(days.size):
            if d[i] > 0:
                t = float(int(days[i]))
                area = area + s * (t - prev)
                s = s * (1.0 - float(int(d[i]))
                         / float(int(at_risk[i])))
                prev = t
        rmst = area + s * (float(tau) - prev)
        return pa.table({
            "n_users": pa.array([n_users], type=pa.int64()),
            "tau_day": pa.array([tau], type=pa.int64()),
            "rmst_days": pa.array([rmst], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_USERS},
    byday AS (
        SELECT day, CAST(sum(d) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS removed
        FROM obs GROUP BY day
    ),
    risk AS (
        SELECT day, d,
               CAST((SELECT count(*) FROM obs) AS BIGINT)
                   - CAST(COALESCE(sum(removed) OVER (
                         ORDER BY day ROWS BETWEEN UNBOUNDED
                         PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_risk
        FROM byday
    ),
    ev AS (SELECT * FROM risk WHERE d > 0),
    fold AS (
        SELECT list_reduce(
                   list_prepend([0.0e0, 1.0e0, 0.0e0],
                       list([CAST(day AS DOUBLE),
                             CAST(d AS DOUBLE),
                             CAST(n_risk AS DOUBLE)]
                            ORDER BY day)),
                   (acc, e) -> [acc[1] + acc[2] * (e[1] - acc[3]),
                                acc[2] * (1.0e0 - e[2] / e[3]),
                                e[1]]) AS a
        FROM ev
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM obs) AS n_users,
           (SELECT CAST(max(day) AS BIGINT) FROM obs) AS tau_day,
           fold.a[1] + fold.a[2]
               * (CAST((SELECT max(day) FROM obs) AS DOUBLE)
                  - fold.a[3]) AS rmst_days
    FROM fold
    """
    return q, sql


# -------------------------------------------------------- events_harrell_c
def _harrell_query():
    def q(sf_dir: str):
        u = _user_table(sf_dir)
        dur = u["day"].to_numpy(np.int64)
        ev = u["d"].to_numpy(np.int64)
        risk = u["n_ev"].to_numpy(np.int64)
        lt = dur[:, None] < dur[None, :]
        # comparable(i,j): dur_i < dur_j and event_i
        comp_m = lt & (ev[:, None] == 1)
        conc_m = comp_m & (risk[:, None] > risk[None, :])
        tied_m = comp_m & (risk[:, None] == risk[None, :])
        comp = int(comp_m.sum())
        conc = int(conc_m.sum())
        tied = int(tied_m.sum())
        c = (2 * conc + tied) / (2 * comp)
        return pa.table({
            "n_comparable": pa.array([comp], type=pa.int64()),
            "n_concordant": pa.array([conc], type=pa.int64()),
            "n_tied_score": pa.array([tied], type=pa.int64()),
            "c_index": pa.array([c], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_USERS},
    pairs AS (
        SELECT a.day AS da, b.day AS db, a.d AS ea, b.d AS eb,
               a.n_ev AS ra, b.n_ev AS rb
        FROM obs a JOIN obs b ON a.user_id < b.user_id
    ),
    cnt AS (
        SELECT
            CAST(sum(CASE WHEN da < db AND ea = 1 THEN 1
                          WHEN db < da AND eb = 1 THEN 1
                          ELSE 0 END) AS BIGINT) AS comp,
            CAST(sum(CASE WHEN da < db AND ea = 1 AND ra > rb
                          THEN 1
                          WHEN db < da AND eb = 1 AND rb > ra
                          THEN 1
                          ELSE 0 END) AS BIGINT) AS conc,
            CAST(sum(CASE WHEN ((da < db AND ea = 1)
                            OR (db < da AND eb = 1))
                           AND ra = rb THEN 1
                          ELSE 0 END) AS BIGINT) AS tied
        FROM pairs
    )
    SELECT comp AS n_comparable, conc AS n_concordant,
           tied AS n_tied_score,
           CAST(2 * conc + tied AS DOUBLE)
               / CAST(2 * comp AS DOUBLE) AS c_index
    FROM cnt
    """
    return q, sql


def build_wave185_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_rmst",) + _rmst_query()))
    add(*(("events_harrell_c",) + _harrell_query()))
    return queries, oracles
