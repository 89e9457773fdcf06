"""Wave-172 queries: Elo ratings, rank-mobility footrule.

- events_elo_types: Elo ratings of the five event types from daily
  count "matches" — every day each ordered type pair plays one
  game (higher count wins, ties score 1/2), and ratings update
  sequentially with K = 8 and the logistic expectation
  1/(1 + 10^((rb - ra)/400)). The fold walks (day, pair) in
  lexicographic order with a 5-slot LIST accumulator; pow(10, x)
  is the one transcendental per game and bit-matches libm.
- supplier_rank_mobility: how much does the supplier revenue
  ranking move month to month? The Spearman FOOTRULE distance
  sum |rank_t(s) - rank_{t-1}(s)| between consecutive months over
  the top-8 suppliers (absent supplier ranks last by key) — exact
  integers per month pair, plus the mean mobility.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_DAY = 86_400_000_000
ELO_K = 8.0
MOB_TOP = 8
TYPES = ["click", "error", "purchase", "signup", "view"]


# ----------------------------------------------------------- events_elo_types
def _elo_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "etype": pa.array([], type=pa.string()),
                "c": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            et = np.asarray(t.column("event_type").to_pylist(),
                            dtype=object)
            day = tus // US_PER_DAY
            import collections
            cnt = collections.Counter(
                zip(day.tolist(), et.tolist()))
            keys = sorted(cnt)
            return pa.table({
                "day": pa.array([k[0] for k in keys],
                                type=pa.int64()),
                "etype": pa.array([k[1] for k in keys],
                                  type=pa.string()),
                "c": pa.array([cnt[k] for k in keys],
                              type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["day", "etype"]).aggregate(
                [("c", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "etype": g.column("etype").cast(pa.string()),
                "c": g.column("c_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        tab = {}
        for _, r in cells.iterrows():
            tab[(int(r["day"]), r["etype"])] = int(r["c"])
        days = sorted(set(d for d, _t in tab))
        t_ix = {t: i for i, t in enumerate(TYPES)}

        r = [1000.0] * 5
        games = 0
        for d in days:
            for i in range(5):
                for j in range(i + 1, 5):
                    ca = tab.get((d, TYPES[i]), 0)
                    cb = tab.get((d, TYPES[j]), 0)
                    if ca > cb:
                        s = 1.0
                    elif cb > ca:
                        s = 0.0
                    else:
                        s = 0.5
                    ea = 1.0 / (1.0 + math_pow10(
                        (r[j] - r[i]) / 400.0))
                    delta = ELO_K * (s - ea)
                    r[i] = r[i] + delta
                    r[j] = r[j] - delta
                    games += 1
        rows = sorted(zip(TYPES, r),
                      key=lambda x: (-x[1], x[0]))
        return pa.table({
            "event_type": pa.array([t for t, _x in rows],
                                   type=pa.string()),
            "elo": pa.array([x for _t, x in rows],
                            type=pa.float64()),
        })

    sql = f"""
    WITH dc AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               event_type AS etype,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    types AS (
        SELECT t.ty,
               CAST(row_number() OVER (ORDER BY t.ty) - 1
                    AS BIGINT) AS ix
        FROM (SELECT unnest(['click', 'error', 'purchase',
                             'signup', 'view']) AS ty) t
    ),
    games AS (
        SELECT d.day, a.ix AS ia, b.ix AS ib,
               CASE WHEN COALESCE(ca.c, 0)
                         > COALESCE(cb.c, 0) THEN 1.0e0
                    WHEN COALESCE(cb.c, 0)
                         > COALESCE(ca.c, 0) THEN 0.0e0
                    ELSE 0.5e0 END AS s
        FROM (SELECT DISTINCT day FROM dc) d
        CROSS JOIN types a
        JOIN types b ON b.ix > a.ix
        LEFT JOIN dc ca ON ca.day = d.day
                       AND ca.etype = a.ty
        LEFT JOIN dc cb ON cb.day = d.day
                       AND cb.etype = b.ty
    ),
    fin AS (
        SELECT list_reduce(
            list_prepend(
                [1000.0e0, 1000.0e0, 1000.0e0, 1000.0e0,
                 1000.0e0],
                list([CAST(ia AS DOUBLE),
                      CAST(ib AS DOUBLE), s, 0.0e0, 0.0e0]
                     ORDER BY day, ia, ib)),
            (acc, e) -> [
                acc[1] + CASE
                    WHEN e[1] = 0 THEN 8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[CAST(e[2] AS INTEGER) + 1]
                           - acc[1]) / 400.0e0)))
                    WHEN e[2] = 0 THEN -8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[1]
                           - acc[CAST(e[1] AS INTEGER) + 1])
                          / 400.0e0)))
                    ELSE 0.0e0 END,
                acc[2] + CASE
                    WHEN e[1] = 1 THEN 8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[CAST(e[2] AS INTEGER) + 1]
                           - acc[2]) / 400.0e0)))
                    WHEN e[2] = 1 THEN -8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[2]
                           - acc[CAST(e[1] AS INTEGER) + 1])
                          / 400.0e0)))
                    ELSE 0.0e0 END,
                acc[3] + CASE
                    WHEN e[1] = 2 THEN 8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[CAST(e[2] AS INTEGER) + 1]
                           - acc[3]) / 400.0e0)))
                    WHEN e[2] = 2 THEN -8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[3]
                           - acc[CAST(e[1] AS INTEGER) + 1])
                          / 400.0e0)))
                    ELSE 0.0e0 END,
                acc[4] + CASE
                    WHEN e[1] = 3 THEN 8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[CAST(e[2] AS INTEGER) + 1]
                           - acc[4]) / 400.0e0)))
                    WHEN e[2] = 3 THEN -8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[4]
                           - acc[CAST(e[1] AS INTEGER) + 1])
                          / 400.0e0)))
                    ELSE 0.0e0 END,
                acc[5] + CASE
                    WHEN e[1] = 4 THEN 8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[CAST(e[2] AS INTEGER) + 1]
                           - acc[5]) / 400.0e0)))
                    WHEN e[2] = 4 THEN -8.0 * (e[3]
                        - 1.0e0 / (1.0e0 + pow(10.0e0,
                          (acc[5]
                           - acc[CAST(e[1] AS INTEGER) + 1])
                          / 400.0e0)))
                    ELSE 0.0e0 END]) AS v
        FROM games
    )
    SELECT t.ty AS event_type,
           fin.v[CAST(t.ix AS INTEGER) + 1] AS elo
    FROM types t CROSS JOIN fin
    ORDER BY elo DESC, t.ty ASC
    """
    return q, sql


def math_pow10(x: float) -> float:
    import math

    return math.pow(10.0, x)


# --------------------------------------------------- supplier_rank_mobility
def _mobility_query(top_n: int = MOB_TOP):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "skey": pa.array([], type=pa.int64()),
                "month": pa.array([], type=pa.int64()),
                "rev": pa.array([], type=pa.int64()),
            })
            if "l_suppkey" not in t.column_names:
                return empty
            skey = t.column("l_suppkey").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            ship = t.column("l_shipdate").cast(
                pa.int64()).to_numpy(zero_copy_only=False)
            month = (ship.astype("datetime64[us]")
                     .astype("datetime64[M]").astype(np.int64))
            cents = np.round(
                t.column("l_extendedprice").to_numpy(
                    zero_copy_only=False) * 100.0
            ).astype(np.int64)
            key = skey * np.int64(1 << 16) + month
            uk, inv = np.unique(key, return_inverse=True)
            rv = np.bincount(inv, weights=cents.astype(
                np.float64)).astype(np.int64)
            return pa.table({
                "skey": pa.array(uk // (1 << 16)),
                "month": pa.array(uk % (1 << 16)),
                "rev": pa.array(rv),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["skey", "month"]).aggregate(
                [("rev", "sum")])
            return pa.table({
                "skey": g.column("skey").cast(pa.int64()),
                "month": g.column("month").cast(pa.int64()),
                "rev": g.column("rev_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "lineitem", ["l_suppkey", "l_shipdate",
                         "l_extendedprice"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        cells = tree_reduce_tables(refs, merge).to_pandas()
        tot = cells.groupby("skey")["rev"].sum()
        top = sorted(
            zip(tot.to_numpy(np.int64),
                tot.index.to_numpy(np.int64)),
            key=lambda r: (-int(r[0]), int(r[1])))[:top_n]
        sup = [int(s) for _r, s in top]
        sub = cells[cells["skey"].isin(set(sup))]
        months = sorted(int(m) for m in sub["month"].unique())
        by_m = {}
        for _, r in sub.iterrows():
            by_m.setdefault(int(r["month"]), {})[
                int(r["skey"])] = int(r["rev"])

        def ranks(m):
            d = by_m.get(m, {})
            order = sorted(sup,
                           key=lambda s: (-d.get(s, -1), s))
            return {s: i + 1 for i, s in enumerate(order)}

        total = 0
        n_pairs = 0
        out_m, out_f = [], []
        prev = ranks(months[0])
        for m in months[1:]:
            cur = ranks(m)
            f = sum(abs(cur[s] - prev[s]) for s in sup)
            out_m.append(m)
            out_f.append(f)
            total += f
            n_pairs += 1
            prev = cur
        # align to the oracle's year*12+month convention
        return pa.table({
            "month": pa.array(
                [m + 1970 * 12 + 1 for m in out_m],
                type=pa.int64()),
            "footrule": pa.array(out_f, type=pa.int64()),
        })

    sql = f"""
    WITH rev AS (
        SELECT l_suppkey AS skey,
               year(l_shipdate) * 12 + month(l_shipdate)
                   AS month,
               CAST(sum(CAST(round_even(l_extendedprice * 100,
                                        0) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem GROUP BY 1, 2
    ),
    top AS (
        SELECT skey FROM (
            SELECT skey, sum(r) AS tr FROM rev GROUP BY skey
            ORDER BY tr DESC, skey ASC LIMIT {top_n})
    ),
    months AS (
        SELECT DISTINCT month FROM rev
        WHERE skey IN (SELECT skey FROM top)
    ),
    grid AS (
        SELECT m.month, t.skey,
               COALESCE(rev.r, -1) AS r
        FROM months m CROSS JOIN top t
        LEFT JOIN rev ON rev.month = m.month
                     AND rev.skey = t.skey
    ),
    rk AS (
        SELECT month, skey,
               CAST(row_number() OVER (PARTITION BY month
                   ORDER BY r DESC, skey ASC) AS BIGINT)
                   AS rnk
        FROM grid
    ),
    foot AS (
        SELECT a.month,
               CAST(sum(abs(a.rnk - b.rnk)) AS BIGINT) AS f
        FROM rk a
        JOIN rk b ON b.skey = a.skey
        JOIN (SELECT month,
                     lag(month) OVER (ORDER BY month) AS pm
              FROM months) mm
          ON mm.month = a.month AND b.month = mm.pm
        GROUP BY a.month
    )
    SELECT month, f AS footrule
    FROM foot
    ORDER BY month
    """
    return q, sql


def build_wave172_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_elo_types",) + _elo_query()))
    add(*(("supplier_rank_mobility",) + _mobility_query()))
    return queries, oracles
