"""Wave-153 queries: group-sequential testing, graph modularity.

- events_obrien_fleming: a group-sequential A/B monitor — the
  cohort-bit error-rate z statistic evaluated at four interim
  looks (25/50/75/100% of the day span) against O'Brien-Fleming
  boundaries c/sqrt(t) with c = 2.024 (the 4-look 5% constant).
  Every look's 2x2 counts are exact integers from cumulative
  day-bounded cells; z is the usual pooled two-proportion
  statistic; the monitor reports each look and whether/when the
  boundary is crossed.
- events_modularity: Newman modularity Q of the multiplicative-
  hash user split on the hourly co-activity graph (edge weight =
  number of hours two users were both active). Distinct
  (hour, user) incidences collapse per block; the bounded user-
  pair weight matrix comes from one per-hour pair expansion; Q
  folds communities' internal weights and degree sums with exact
  integers and two divisions.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
HASH_A = 2654435761
OBF_C = 2.024


# --------------------------------------------------- events_obrien_fleming
def _obf_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "g": pa.array([], type=pa.int64()),
                "err": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist())
            day = tus // US_PER_DAY
            g = ((uid * np.int64(HASH_A)) % np.int64(1 << 32)) \
                >> np.int64(31)
            err = (et == "error").astype(np.int64)
            key = (day * 2 + g) * 2 + err
            uk, c = np.unique(key, return_counts=True)
            return pa.table({
                "day": pa.array(uk // 4),
                "g": pa.array((uk // 2) % 2),
                "err": pa.array(uk % 2),
                "c": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["day", "g", "err"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "g": g.column("g").cast(pa.int64()),
                "err": g.column("err").cast(pa.int64()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        dmin, dmax = (int(cells["day"].min()),
                      int(cells["day"].max()))
        span = dmax - dmin + 1

        out = {"look": [], "frac_num": [], "cut_day": [],
               "n1": [], "e1": [], "n0": [], "e0": [],
               "z": [], "bound": [], "crossed": []}
        for look in range(1, 5):
            cut = dmin + (span * look) // 4 - 1
            sub = cells[cells["day"] <= cut]
            n1 = int(sub.loc[sub["g"] == 1, "c"].sum())
            n0 = int(sub.loc[sub["g"] == 0, "c"].sum())
            e1 = int(sub.loc[(sub["g"] == 1)
                             & (sub["err"] == 1), "c"].sum())
            e0 = int(sub.loc[(sub["g"] == 0)
                             & (sub["err"] == 1), "c"].sum())
            p1 = float(e1) / float(n1)
            p0 = float(e0) / float(n0)
            pp = float(e1 + e0) / float(n1 + n0)
            se = math.sqrt(pp * (1.0 - pp)
                           * (1.0 / float(n1)
                              + 1.0 / float(n0)))
            z = (p1 - p0) / se
            tfrac = float(look) / 4.0
            bound = OBF_C / math.sqrt(tfrac)
            out["look"].append(look)
            out["frac_num"].append(look)
            out["cut_day"].append(cut)
            out["n1"].append(n1)
            out["e1"].append(e1)
            out["n0"].append(n0)
            out["e0"].append(e0)
            out["z"].append(z)
            out["bound"].append(bound)
            out["crossed"].append(
                1 if abs(z) > bound else 0)
        return pa.table({
            "look": pa.array(out["look"], type=pa.int64()),
            "cut_day": pa.array(out["cut_day"],
                                type=pa.int64()),
            "n1": pa.array(out["n1"], type=pa.int64()),
            "e1": pa.array(out["e1"], type=pa.int64()),
            "n0": pa.array(out["n0"], type=pa.int64()),
            "e0": pa.array(out["e0"], type=pa.int64()),
            "z": pa.array(out["z"], type=pa.float64()),
            "bound": pa.array(out["bound"],
                              type=pa.float64()),
            "crossed": pa.array(out["crossed"],
                                type=pa.int64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               ((user_id * {HASH_A}) % 4294967296)
                   // 2147483648 AS g,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS err
        FROM events
    ),
    span AS (
        SELECT min(day) AS dmin,
               max(day) - min(day) + 1 AS s
        FROM e
    ),
    looks AS (
        SELECT l.look,
               span.dmin + (span.s * l.look) // 4 - 1 AS cut
        FROM (SELECT unnest(generate_series(1, 4)) AS look) l
        CROSS JOIN span
    ),
    stats AS (
        SELECT lk.look, lk.cut,
               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN g = 1 AND err = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS e1,
               CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n0,
               CAST(sum(CASE WHEN g = 0 AND err = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS e0
        FROM looks lk JOIN e ON e.day <= lk.cut
        GROUP BY lk.look, lk.cut
    )
    SELECT look,
           cut AS cut_day,
           n1, e1, n0, e0,
           (CAST(e1 AS DOUBLE) / CAST(n1 AS DOUBLE)
            - CAST(e0 AS DOUBLE) / CAST(n0 AS DOUBLE))
           / sqrt((CAST(e1 + e0 AS DOUBLE)
                   / CAST(n1 + n0 AS DOUBLE))
                  * (1.0e0 - CAST(e1 + e0 AS DOUBLE)
                     / CAST(n1 + n0 AS DOUBLE))
                  * (1.0e0 / CAST(n1 AS DOUBLE)
                     + 1.0e0 / CAST(n0 AS DOUBLE))) AS z,
           {OBF_C!r} / sqrt(CAST(look AS DOUBLE) / 4.0e0)
               AS bound,
           CAST(CASE WHEN abs(
               (CAST(e1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(e0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / sqrt((CAST(e1 + e0 AS DOUBLE)
                       / CAST(n1 + n0 AS DOUBLE))
                      * (1.0e0 - CAST(e1 + e0 AS DOUBLE)
                         / CAST(n1 + n0 AS DOUBLE))
                      * (1.0e0 / CAST(n1 AS DOUBLE)
                         + 1.0e0 / CAST(n0 AS DOUBLE))))
               > {OBF_C!r} / sqrt(CAST(look AS DOUBLE)
                                  / 4.0e0)
               THEN 1 ELSE 0 END AS BIGINT) AS crossed
    FROM stats
    ORDER BY look
    """
    return q, sql


# ------------------------------------------------------- events_modularity
def _modularity_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // US_PER_HOUR
            key = hour * np.int64(1 << 20) + uid
            uk = np.unique(key)
            return pa.table({
                "hour": pa.array(uk // (1 << 20)),
                "uid": pa.array(uk % (1 << 20)),
            })

        def pairs(g: pa.Table) -> pa.Table:
            us = np.unique(
                g.column("uid").to_numpy(zero_copy_only=False)
            )
            if us.size < 2:
                return pa.table({
                    "ua": pa.array([], type=pa.int64()),
                    "ub": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.int64()),
                })
            ii, jj = np.triu_indices(us.size, k=1)
            return pa.table({
                "ua": pa.array(us[ii]),
                "ub": pa.array(us[jj]),
                "w": pa.array(np.ones(ii.size,
                                      dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["ua", "ub"]).aggregate(
                [("w", "sum")])
            return pa.table({
                "ua": g.column("ua").cast(pa.int64()),
                "ub": g.column("ub").cast(pa.int64()),
                "w": g.column("w_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id"])
            .map_batches(prep, batch_format="pyarrow")
            .groupby("hour")
            .map_groups(pairs, batch_format="pyarrow")
            .to_arrow_refs()
        )
        ed = tree_reduce_tables(refs, merge).to_pandas()
        ua = ed["ua"].to_numpy(np.int64)
        ub = ed["ub"].to_numpy(np.int64)
        w = ed["w"].to_numpy(np.int64)
        ca = ((ua * HASH_A) % (1 << 32)) >> 31
        cb = ((ub * HASH_A) % (1 << 32)) >> 31

        two_m = 2 * int(w.sum())
        # weighted degrees
        deg = {}
        for u, v, ww in zip(ua.tolist(), ub.tolist(),
                            w.tolist()):
            deg[u] = deg.get(u, 0) + ww
            deg[v] = deg.get(v, 0) + ww
        w_in = int(w[(ca == cb)].sum())
        d0 = sum(d for u, d in deg.items()
                 if ((u * HASH_A) % (1 << 32)) >> 31 == 0)
        d1 = sum(d for u, d in deg.items()
                 if ((u * HASH_A) % (1 << 32)) >> 31 == 1)
        tm = float(two_m)
        q_mod = (float(2 * w_in) / tm
                 - ((float(d0) / tm) * (float(d0) / tm)
                    + (float(d1) / tm) * (float(d1) / tm)))
        return pa.table({
            "n_edges": pa.array([len(ed)], type=pa.int64()),
            "two_m": pa.array([two_m], type=pa.int64()),
            "w_internal": pa.array([w_in], type=pa.int64()),
            "deg_c0": pa.array([d0], type=pa.int64()),
            "deg_c1": pa.array([d1], type=pa.int64()),
            "modularity": pa.array([q_mod],
                                   type=pa.float64()),
        })

    sql = f"""
    WITH inc AS (
        SELECT DISTINCT epoch_us(ts) // {US_PER_HOUR} AS hour,
               user_id AS uid
        FROM events
    ),
    edges AS (
        SELECT a.uid AS ua, b.uid AS ub,
               CAST(count(*) AS BIGINT) AS w
        FROM inc a JOIN inc b
          ON b.hour = a.hour AND b.uid > a.uid
        GROUP BY 1, 2
    ),
    comm AS (
        SELECT ua, ub, w,
               ((ua * {HASH_A}) % 4294967296) // 2147483648
                   AS ca,
               ((ub * {HASH_A}) % 4294967296) // 2147483648
                   AS cb
        FROM edges
    ),
    degs AS (
        SELECT uid,
               CAST(sum(w) AS BIGINT) AS d,
               ((uid * {HASH_A}) % 4294967296) // 2147483648
                   AS c
        FROM (
            SELECT ua AS uid, w FROM comm
            UNION ALL
            SELECT ub AS uid, w FROM comm
        ) GROUP BY uid
    ),
    tots AS (
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM comm)
                AS n_edges,
            (SELECT CAST(2 * sum(w) AS BIGINT) FROM comm)
                AS two_m,
            (SELECT CAST(COALESCE(sum(w), 0) AS BIGINT)
             FROM comm WHERE ca = cb) AS w_in,
            (SELECT CAST(COALESCE(sum(d), 0) AS BIGINT)
             FROM degs WHERE c = 0) AS d0,
            (SELECT CAST(COALESCE(sum(d), 0) AS BIGINT)
             FROM degs WHERE c = 1) AS d1
    )
    SELECT n_edges, two_m,
           w_in AS w_internal,
           d0 AS deg_c0, d1 AS deg_c1,
           CAST(2 * w_in AS DOUBLE) / CAST(two_m AS DOUBLE)
           - ((CAST(d0 AS DOUBLE) / CAST(two_m AS DOUBLE))
              * (CAST(d0 AS DOUBLE) / CAST(two_m AS DOUBLE))
              + (CAST(d1 AS DOUBLE) / CAST(two_m AS DOUBLE))
                * (CAST(d1 AS DOUBLE)
                   / CAST(two_m AS DOUBLE)))
               AS modularity
    FROM tots
    """
    return q, sql


def build_wave153_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_obrien_fleming",) + _obf_query()))
    add(*(("events_modularity",) + _modularity_query()))
    return queries, oracles
