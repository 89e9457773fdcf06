"""Wave-40 queries: Benford first-digit audit, behavioral entropy
profiles, and Poisson overdispersion.

- events_benford: first-significant-digit distribution of the value
  cents vs Benford's law — the classic fraud/data-quality audit.
  Digit extraction is an exact integer divide-down loop (NOT
  floor(log10): 10^k boundaries mis-round there); expected counts and
  chi-square terms are identical f64 expressions per digit row.
- events_user_hod_entropy: per-user entropy of the hour-of-day
  activity profile — the behavioral-regularity feature. Bounded
  (user, hod) partials; the entropy fold is sequential in hod order
  with scalar math.log, replayed per user by an ORDER BY list_reduce.
- events_type_dispersion: variance-to-mean ratio of per-hour counts
  per event type (Poisson overdispersion monitor). Exact int64
  (n, S, S2) over the bounded (type, hour) table; VMR is the identical
  f64 expression on both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols
from .queries_ext import _add_user_bucket


# ------------------------------------------------------------ events_benford
def _benford_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "value" not in t.column_names:
                return pa.table(
                    {"digit": pa.array([], type=pa.int64()),
                     "obs": pa.array([], type=pa.int64())}
                )
            cents = np.round(
                t.column("value").to_numpy(zero_copy_only=False)
                * 100.0
            ).astype(np.int64)
            cents = cents[cents > 0]
            d = cents.copy()
            for _ in range(18):  # exact divide-down to one digit
                big = d >= 10
                if not big.any():
                    break
                d[big] //= 10
            ud, uc = np.unique(d, return_counts=True)
            return pa.table(
                {"digit": pa.array(ud),
                 "obs": pa.array(uc.astype(np.int64))}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("digit").aggregate([("obs", "sum")])
            return pa.table(
                {"digit": g.column("digit"),
                 "obs": g.column("obs_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["value"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas().sort_values(
            "digit"
        )
        n = int(a["obs"].sum())
        obs = dict(zip(a["digit"].astype(int),
                       a["obs"].astype(int)))
        rows = {"digit": [], "obs": [], "expected": [], "term": []}
        for dgt in range(1, 10):
            o = obs.get(dgt, 0)
            e = float(n) * (math.log10(float(dgt + 1))
                            - math.log10(float(dgt)))
            rows["digit"].append(dgt)
            rows["obs"].append(o)
            rows["expected"].append(e)
            rows["term"].append((float(o) - e) * (float(o) - e) / e)
        return pa.table(
            {"digit": pa.array(rows["digit"], type=pa.int64()),
             "obs": pa.array(rows["obs"], type=pa.int64()),
             "expected": pa.array(rows["expected"],
                                  type=pa.float64()),
             "term": pa.array(rows["term"], type=pa.float64())}
        )

    sql = """
    WITH c AS (
        SELECT CAST(round_even(value * 100, 0) AS BIGINT) AS cents
        FROM events
        WHERE CAST(round_even(value * 100, 0) AS BIGINT) > 0
    ),
    d AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
            AS digit
        FROM c
    ),
    o AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM d
        GROUP BY digit
    ),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o),
    grid AS (SELECT unnest(range(1, 10)) AS digit)
    SELECT CAST(g.digit AS BIGINT) AS digit,
           CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs,
           CAST(n.n AS DOUBLE)
               * (log10(CAST(g.digit + 1 AS DOUBLE))
                  - log10(CAST(g.digit AS DOUBLE))) AS expected,
           (CAST(COALESCE(o.obs, 0) AS DOUBLE)
            - CAST(n.n AS DOUBLE)
              * (log10(CAST(g.digit + 1 AS DOUBLE))
                 - log10(CAST(g.digit AS DOUBLE))))
           * (CAST(COALESCE(o.obs, 0) AS DOUBLE)
              - CAST(n.n AS DOUBLE)
                * (log10(CAST(g.digit + 1 AS DOUBLE))
                   - log10(CAST(g.digit AS DOUBLE))))
           / (CAST(n.n AS DOUBLE)
              * (log10(CAST(g.digit + 1 AS DOUBLE))
                 - log10(CAST(g.digit AS DOUBLE)))) AS term
    FROM grid g LEFT JOIN o ON o.digit = g.digit
    CROSS JOIN n
    """
    return q, sql


# ---------------------------------------------------- events_user_hod_entropy
def _hod_entropy_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        def partial(t: pa.Table) -> pa.Table:
            if "user_id" not in t.column_names:
                return pa.table(
                    {"user_id": pa.array([], type=pa.int64()),
                     "hod": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            hod = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600) % 24
            g = pa.table(
                {"user_id": t.column("user_id").cast(pa.int64()),
                 "hod": pa.array(hod)}
            ).group_by(["user_id", "hod"]).aggregate(
                [("hod", "count")]
            )
            return pa.table(
                {"user_id": g.column("user_id"),
                 "hod": g.column("hod"),
                 "cnt": g.column("hod_count").cast(pa.int64())}
            )

        def entropy(g: pa.Table) -> pa.Table:
            # (user, hod) sums via lexsort + reduceat; the per-user
            # entropy fold stays SEQUENTIAL in hod order (the oracle
            # replays the left fold) over bounded <=24 terms per user
            u = g.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            hod = g.column("hod").to_numpy(zero_copy_only=False)
            cnt = g.column("cnt").to_numpy(zero_copy_only=False)
            order = np.lexsort((hod, u))
            u_s, h_s, c_s = u[order], hod[order], cnt[order]
            starts = np.flatnonzero(
                np.r_[True, (u_s[1:] != u_s[:-1])
                      | (h_s[1:] != h_s[:-1])]
            )
            cu = np.add.reduceat(c_s, starts)
            uu = u_s[starts]
            ustarts = np.flatnonzero(
                np.r_[True, uu[1:] != uu[:-1]]
            )
            uends = np.r_[ustarts[1:], uu.size]
            out = {"user_id": [], "n": [], "entropy": []}
            for s0, e0 in zip(ustarts, uends):
                c = cu[s0:e0]
                n = int(c.sum())
                h = 0.0  # sequential fold in hod order
                for ci in c:
                    p = float(int(ci)) / float(n)
                    h = h + p * math.log(p)
                out["user_id"].append(int(uu[s0]))
                out["n"].append(n)
                out["entropy"].append(-h)
            return pa.table(
                {"user_id": pa.array(out["user_id"],
                                     type=pa.int64()),
                 "n": pa.array(out["n"], type=pa.int64()),
                 "entropy": pa.array(out["entropy"],
                                     type=pa.float64())}
            )

        ds = (
            read_cols(sf_dir, "events", ["user_id", "ts"])
            .map_batches(partial, batch_format="pyarrow")
            .map_batches(_add_user_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(entropy, batch_format="pyarrow")
        )
        return _cast(
            ds,
            {"user_id": pa.int64(), "n": pa.int64(),
             "entropy": pa.float64()},
        )

    sql = """
    WITH c AS (
        SELECT user_id,
               (epoch_us(ts) // 1000000 // 3600) % 24 AS hod,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    t AS (
        SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n FROM c
        GROUP BY user_id
    ),
    terms AS (
        SELECT c.user_id, c.hod, t.n,
               (CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE))
               * ln(CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE))
                   AS term
        FROM c JOIN t ON t.user_id = c.user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(n) AS BIGINT) AS n,
           -list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list(term ORDER BY hod)),
               (a, b) -> a + b) AS entropy
    FROM terms GROUP BY user_id
    """
    return q, sql


# --------------------------------------------------- events_type_dispersion
def _dispersion_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names:
                return pa.table(
                    {"event_type": pa.array([], type=pa.string()),
                     "hour": pa.array([], type=pa.int64()),
                     "cnt": pa.array([], type=pa.int64())}
                )
            hour = (t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 1_000_000 // 3600)
            g = pa.table(
                {"event_type": t.column("event_type"),
                 "hour": pa.array(hour)}
            ).group_by(["event_type", "hour"]).aggregate(
                [("hour", "count")]
            )
            return pa.table(
                {"event_type": g.column("event_type"),
                 "hour": g.column("hour"),
                 "cnt": g.column("hour_count").cast(pa.int64())}
            )

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "hour"]).aggregate(
                [("cnt", "sum")]
            )
            return pa.table(
                {"event_type": g.column("event_type"),
                 "hour": g.column("hour"),
                 "cnt": g.column("cnt_sum").cast(pa.int64())}
            )

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        rows = {"event_type": [], "n_hours": [], "s": [], "s2": [],
                "vmr": []}
        for et, g in a.groupby("event_type"):
            c = g["cnt"].to_numpy(np.int64)
            n = int(c.size)
            s = int(c.sum())
            s2 = int((c * c).sum())
            mean = float(np.float64(s) / np.float64(n))
            var = (float(np.float64(s2) / np.float64(n))
                   - mean * mean)
            rows["event_type"].append(str(et))
            rows["n_hours"].append(n)
            rows["s"].append(s)
            rows["s2"].append(s2)
            rows["vmr"].append(var / mean)
        return pa.table(
            {"event_type": pa.array(rows["event_type"],
                                    type=pa.string()),
             "n_hours": pa.array(rows["n_hours"], type=pa.int64()),
             "s": pa.array(rows["s"], type=pa.int64()),
             "s2": pa.array(rows["s2"], type=pa.int64()),
             "vmr": pa.array(rows["vmr"], type=pa.float64())}
        )

    sql = """
    WITH c AS (
        SELECT event_type,
               epoch_us(ts) // 1000000 // 3600 AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(cnt) AS BIGINT) AS s,
               CAST(sum(cnt * cnt) AS BIGINT) AS s2
        FROM c GROUP BY event_type
    )
    SELECT event_type, n_hours, s, s2,
           (CAST(s2 AS DOUBLE) / CAST(n_hours AS DOUBLE)
            - (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE))
              * (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE)))
           / (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE)) AS vmr
    FROM g
    """
    return q, sql


def build_wave40_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_benford",) + _benford_query()))
    add(*(("events_user_hod_entropy",) + _hod_entropy_query()))
    add(*(("events_type_dispersion",) + _dispersion_query()))
    return queries, oracles
