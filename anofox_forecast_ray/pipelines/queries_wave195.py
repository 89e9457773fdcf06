"""Wave-195 query: Cox proportional hazards, replayed Newton steps.

events_cox_ph: a Cox PH fit of time-to-first-purchase (day
granularity, censor at last event — the wave-42 KM conventions) on
the binary covariate x = user-parity cohort (user_id % 2 — the same
A/B split the Mann-Whitney query uses; a weekend-share covariate is
degenerate here because no user has >50% weekend events).
With a binary covariate and Breslow tie handling everything
collapses to the bounded per-day table (d1, d, r1, r0):
  S0 = r0 + r1*e^b,  S1 = r1*e^b,  p = S1/S0
  U(b) = sum_days d1 - d*p        (score)
  I(b) = sum_days d*(p - p^2)     (information; S2 = S1 for binary)
Two Newton-Raphson steps from b = 0 are unrolled on both sides
(b1 = U(0)/I(0), b2 = b1 + U(b1)/I(b1)), with ONE scalar exp per
step (math.exp == DuckDB exp). Also emits the score test at zero,
U(0)^2/I(0) — the logrank-type chi-square. Cross-checked against a
per-subject partial-likelihood implementation in the unit test.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket

DAY_US = 86_400_000_000


def cox_newton(day, d1, dt, r1, r0, steps: int = 2):
    """Folds over event days in ascending order; returns
    (beta, score_chi2_at_0)."""
    def u_i(beta):
        expb = math.exp(beta)
        u = 0.0
        info = 0.0
        for i in range(len(day)):
            p = (r1[i] * expb) / (r0[i] + r1[i] * expb)
            u = u + (float(d1[i]) - dt[i] * p)
            info = info + dt[i] * (p - p * p)
        return u, info

    u0, i0 = u_i(0.0e0)
    chi2 = u0 * u0 / i0
    beta = 0.0e0
    for _ in range(steps):
        u, info = u_i(beta)
        beta = beta + u / info
    return beta, chi2


def _user_rows(sf_dir: str):
    """Per-user (day, d, x) with x = weekend-heavy flag."""
    import pandas as pd
    import ray.data as rd

    from ..stages.source_rollup import tree_reduce_tables

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"user_id": pa.array([], type=pa.int64()),
             "first_ts": pa.array([], type=pa.int64()),
             "last_ts": pa.array([], type=pa.int64()),
             "first_p": pa.array([], type=pa.int64()),
             "n_ev": pa.array([], type=pa.int64()),
             "n_wk": pa.array([], type=pa.int64())}
        )
        if "user_id" not in t.column_names or t.num_rows == 0:
            return empty
        et = np.asarray(t.column("event_type").to_pylist())
        tus = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dow = ((tus // DAY_US) + 4) % 7
        wk = ((dow == 6) | (dow == 0)).astype(np.int64)
        df = pa.table(
            {"user_id": t.column("user_id").cast(pa.int64()),
             "tus": pa.array(tus),
             "is_p": pa.array(
                 (et == "purchase").astype(np.int8)),
             "wk": pa.array(wk)}
        ).to_pandas()
        BIG = np.int64(1) << 62
        df["first_p"] = np.where(df["is_p"] == 1, df["tus"], BIG)
        a = (df.groupby("user_id")
             .agg(first_ts=("tus", "min"), last_ts=("tus", "max"),
                  first_p=("first_p", "min"),
                  n_ev=("tus", "size"),
                  n_wk=("wk", "sum")).reset_index())
        a["n_ev"] = a["n_ev"].astype("int64")
        a["n_wk"] = a["n_wk"].astype("int64")
        return pa.Table.from_pandas(a, preserve_index=False)

    def merge_bucket(g: pa.Table) -> pa.Table:
        a = g.group_by("user_id").aggregate(
            [("first_ts", "min"), ("last_ts", "max"),
             ("first_p", "min"), ("n_ev", "sum"), ("n_wk", "sum")]
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
        uid = a.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        x = (uid % 2).astype(np.int64)
        return pa.table(
            {"day": pa.array(day),
             "d": pa.array(event.astype(np.int64)),
             "x": pa.array(x)}
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


# ------------------------------------------------------- events_cox_ph
def _cox_query():
    def q(sf_dir: str):
        import pandas as pd

        u = _user_rows(sf_dir)
        g = u.copy()
        g["d1"] = ((g["d"] == 1) & (g["x"] == 1)).astype(np.int64)
        g["rem1"] = (g["x"] == 1).astype(np.int64)
        byday = (g.groupby("day")
                 .agg(d1=("d1", "sum"), dt=("d", "sum"),
                      rem1=("rem1", "sum"), rem=("d", "size"))
                 .reset_index().sort_values("day")
                 .reset_index(drop=True))
        tot = int(byday["rem"].sum())
        tot1 = int(byday["rem1"].sum())
        rem_b = np.concatenate(
            ([0], np.cumsum(byday["rem"].to_numpy(np.int64))[:-1]))
        rem1_b = np.concatenate(
            ([0],
             np.cumsum(byday["rem1"].to_numpy(np.int64))[:-1]))
        r = tot - rem_b
        r1 = tot1 - rem1_b
        r0 = r - r1
        keep = byday["dt"].to_numpy(np.int64) > 0
        day = byday["day"].to_numpy(np.int64)[keep]
        d1 = byday["d1"].to_numpy(np.int64)[keep]
        dt = byday["dt"].to_numpy(np.int64)[keep]
        beta, chi2 = cox_newton(day, d1, dt, r1[keep], r0[keep])
        n_events = int(dt.sum())
        return pa.table({
            "n_events": pa.array([n_events], type=pa.int64()),
            "beta_cox": pa.array([beta], type=pa.float64()),
            "score_chi2": pa.array([chi2], type=pa.float64()),
        })

    fold_terms = """
               list_reduce(list_prepend(0.0e0,
                   list(CAST(d1 AS DOUBLE)
                        - CAST(dt AS DOUBLE)
                          * ((CAST(r1 AS DOUBLE) * {EXPB})
                             / (CAST(r0 AS DOUBLE)
                                + CAST(r1 AS DOUBLE) * {EXPB}))
                        ORDER BY day)), (p, v) -> p + v) AS u,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(dt AS DOUBLE)
                        * (((CAST(r1 AS DOUBLE) * {EXPB})
                            / (CAST(r0 AS DOUBLE)
                               + CAST(r1 AS DOUBLE) * {EXPB}))
                           - ((CAST(r1 AS DOUBLE) * {EXPB})
                              / (CAST(r0 AS DOUBLE)
                                 + CAST(r1 AS DOUBLE) * {EXPB}))
                             * ((CAST(r1 AS DOUBLE) * {EXPB})
                                / (CAST(r0 AS DOUBLE)
                                   + CAST(r1 AS DOUBLE)
                                     * {EXPB})))
                        ORDER BY day)), (p, v) -> p + v) AS i
    """
    sql = f"""
    WITH u AS (
        SELECT user_id,
               min(epoch_us(ts)) AS first_ts,
               max(epoch_us(ts)) AS last_ts,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS first_p,
               CAST(count(*) AS BIGINT) AS n_ev
        FROM events GROUP BY user_id
    ),
    obs AS (
        SELECT CASE WHEN first_p IS NOT NULL
                    THEN (first_p - first_ts) // {DAY_US}
                    ELSE (last_ts - first_ts) // {DAY_US}
               END AS day,
               CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END
                   AS d,
               CAST(user_id % 2 AS BIGINT) AS x
        FROM u
    ),
    byday AS (
        SELECT day,
               CAST(sum(CASE WHEN d = 1 AND x = 1 THEN 1
                             ELSE 0 END) AS BIGINT) AS d1,
               CAST(sum(d) AS BIGINT) AS dt,
               CAST(sum(x) AS BIGINT) AS rem1,
               CAST(count(*) AS BIGINT) AS rem
        FROM obs GROUP BY day
    ),
    risk AS (
        SELECT day, d1, dt,
               CAST((SELECT sum(rem1) FROM byday) AS BIGINT)
                   - CAST(coalesce(sum(rem1) OVER (
                         ORDER BY day ROWS BETWEEN UNBOUNDED
                         PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS r1,
               (CAST((SELECT sum(rem) FROM byday) AS BIGINT)
                   - CAST(coalesce(sum(rem) OVER (
                         ORDER BY day ROWS BETWEEN UNBOUNDED
                         PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT))
               - (CAST((SELECT sum(rem1) FROM byday) AS BIGINT)
                   - CAST(coalesce(sum(rem1) OVER (
                         ORDER BY day ROWS BETWEEN UNBOUNDED
                         PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT)) AS r0
        FROM byday
    ),
    ev AS (SELECT * FROM risk WHERE dt > 0),
    s0 AS (
        SELECT {fold_terms.format(EXPB="exp(0.0e0)")}
        FROM ev
    ),
    b1 AS (SELECT 0.0e0 + u / i AS beta, u, i FROM s0),
    s1 AS (
        SELECT {fold_terms.format(
            EXPB="exp((SELECT beta FROM b1))")}
        FROM ev
    ),
    b2 AS (
        SELECT (SELECT beta FROM b1) + u / i AS beta FROM s1
    )
    SELECT (SELECT CAST(sum(dt) AS BIGINT) FROM ev) AS n_events,
           (SELECT beta FROM b2) AS beta_cox,
           (SELECT u * u / i FROM s0) AS score_chi2
    FROM (SELECT 1)
    """
    return q, sql


def build_wave195_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_cox_ph",) + _cox_query()))
    return queries, oracles
