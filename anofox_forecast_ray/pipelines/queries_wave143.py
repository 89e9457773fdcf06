"""Wave-143 queries: newsvendor policy, Lindley queue waits.

- events_newsvendor: the newsvendor stocking problem over daily
  demand (daily event counts). With underage cost 3 and overage
  cost 1 the critical fractile is 3/4, so the optimal stock is the
  exact ceil(0.75 n)-th order statistic — pure integer selection —
  and both policies (optimal vs floor-mean stock) are evaluated by
  their EXACT integer realized costs sum(3*max(0,d-S) + max(0,S-d)).
  Optimality is checked by construction: cost_opt <= cost_mean.
- events_lindley_queue: a single-server queue driven by the real
  arrival stream — per day (the queue drains overnight), waiting
  times follow Lindley's recursion W <- max(0, W + s - a) with a
  DETERMINISTIC integer service time s = floor(0.8 * mean gap)
  (80% utilization). Everything is int64 microseconds: the gap
  sequence of a sorted multiset is unique (ties make zero gaps in
  a fixed position), each day folds inside its own task, and only
  (n, sum_wait, max_wait) per day reach the driver. The oracle
  replays each day's fold with a 3-slot LIST accumulator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
NV_CU = 3  # underage cost
NV_CO = 1  # overage cost


# ---------------------------------------------------------- events_newsvendor
def _newsvendor_query(cu: int = NV_CU, co: int = NV_CO):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "day": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            day = tus // US_PER_DAY
            ud, c = np.unique(day, return_counts=True)
            return pa.table({
                "day": pa.array(ud.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("day").aggregate([("cnt", "sum")])
            return pa.table({
                "day": g.column("day").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        d = tree_reduce_tables(refs, merge).to_pandas()
        demand = sorted(int(v) for v in d["cnt"])
        n = len(demand)
        k = (n * cu + (cu + co) - 1) // (cu + co)  # ceil(q*n)
        s_opt = demand[k - 1]
        s_mean = sum(demand) // n

        def cost(s):
            tot = 0
            for v in demand:
                if v > s:
                    tot += cu * (v - s)
                else:
                    tot += co * (s - v)
            return tot

        c_opt = cost(s_opt)
        c_mean = cost(s_mean)
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "stock_opt": pa.array([s_opt], type=pa.int64()),
            "stock_mean": pa.array([s_mean], type=pa.int64()),
            "cost_opt": pa.array([c_opt], type=pa.int64()),
            "cost_mean": pa.array([c_mean], type=pa.int64()),
        })

    sql = f"""
    WITH dc AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(cnt) AS BIGINT) AS s FROM dc),
    so AS (
        SELECT cnt AS s_opt
        FROM (SELECT cnt, row_number() OVER (ORDER BY cnt)
                     AS r FROM dc), nn
        WHERE r = (nn.n * {cu} + {cu + co} - 1) // {cu + co}
    ),
    sm AS (SELECT s // n AS s_mean FROM nn),
    costs AS (
        SELECT
            CAST(sum(CASE WHEN cnt > so.s_opt
                     THEN {cu} * (cnt - so.s_opt)
                     ELSE {co} * (so.s_opt - cnt) END)
                 AS BIGINT) AS cost_opt,
            CAST(sum(CASE WHEN cnt > sm.s_mean
                     THEN {cu} * (cnt - sm.s_mean)
                     ELSE {co} * (sm.s_mean - cnt) END)
                 AS BIGINT) AS cost_mean
        FROM dc CROSS JOIN so CROSS JOIN sm
    )
    SELECT nn.n AS n_days,
           so.s_opt AS stock_opt,
           sm.s_mean AS stock_mean,
           costs.cost_opt AS cost_opt,
           costs.cost_mean AS cost_mean
    FROM nn CROSS JOIN so CROSS JOIN sm CROSS JOIN costs
    """
    return q, sql


# ------------------------------------------------------- events_lindley_queue
def _lindley_query():
    def q(sf_dir: str):
        import pandas as pd
        import ray
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def prep(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "day": pa.array(
                    (tus // US_PER_DAY).astype(np.int64)),
                "tus": pa.array(tus),
            })

        # pass 1: global within-day gap totals for the service time
        def gap_stats(g: pa.Table) -> pa.Table:
            tus = np.sort(
                g.column("tus").to_numpy(zero_copy_only=False)
            )
            gaps = np.diff(tus)
            return pa.table({
                "s": pa.array([int(gaps.sum())],
                              type=pa.int64()),
                "c": pa.array([int(gaps.size)],
                              type=pa.int64()),
            })

        def read():
            return read_cols(sf_dir, "events", ["ts"]).map_batches(prep, batch_format="pyarrow")

        def sum_merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "s": pa.array([pc.sum(t.column("s")).as_py()],
                              type=pa.int64()),
                "c": pa.array([pc.sum(t.column("c")).as_py()],
                              type=pa.int64()),
            })

        refs = list(
            read().groupby("day")
            .map_groups(gap_stats, batch_format="pyarrow")
            .to_arrow_refs()
        )
        gs = tree_reduce_tables(refs, sum_merge).to_pandas()
        srv = (int(gs["s"].iloc[0]) * 4) \
            // (5 * int(gs["c"].iloc[0]))
        srv_ref = ray.put(srv)

        # pass 2: per-day integer Lindley fold
        def day_waits(g: pa.Table) -> pa.Table:
            s = ray.get(srv_ref)
            tus = np.sort(
                g.column("tus").to_numpy(zero_copy_only=False)
            )
            gaps = np.diff(tus)
            w = 0
            sw = 0
            mw = 0
            for a in gaps.tolist():
                w = w + s - int(a)
                if w < 0:
                    w = 0
                sw += w
                if w > mw:
                    mw = w
            return pa.table({
                "n": pa.array([int(gaps.size)],
                              type=pa.int64()),
                "sum_w": pa.array([sw], type=pa.int64()),
                "max_w": pa.array([mw], type=pa.int64()),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({
                "n": pa.array([pc.sum(t.column("n")).as_py()],
                              type=pa.int64()),
                "sum_w": pa.array(
                    [pc.sum(t.column("sum_w")).as_py()],
                    type=pa.int64()),
                "max_w": pa.array(
                    [pc.max(t.column("max_w")).as_py()],
                    type=pa.int64()),
            })

        refs = list(
            read().groupby("day")
            .map_groups(day_waits, batch_format="pyarrow")
            .to_arrow_refs()
        )
        w = tree_reduce_tables(refs, merge).to_pandas()
        n = int(w["n"].iloc[0])
        sw = int(w["sum_w"].iloc[0])
        mw = int(w["max_w"].iloc[0])
        return pa.table({
            "n_jobs": pa.array([n], type=pa.int64()),
            "service_us": pa.array([srv], type=pa.int64()),
            "sum_wait_us": pa.array([sw], type=pa.int64()),
            "max_wait_us": pa.array([mw], type=pa.int64()),
            "mean_wait_s": pa.array(
                [(float(sw) / float(n)) / 1000000.0],
                type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               epoch_us(ts) AS tus
        FROM events
    ),
    gaps AS (
        SELECT day,
               tus - lag(tus) OVER (PARTITION BY day
                                    ORDER BY tus) AS g,
               tus
        FROM e
    ),
    srvc AS (
        SELECT CAST(sum(g) AS BIGINT) * 4
                   // (5 * CAST(count(g) AS BIGINT)) AS s
        FROM gaps WHERE g IS NOT NULL
    ),
    perday AS (
        SELECT day,
               CAST(count(g) AS BIGINT) AS n,
               list_reduce(
                   list_prepend([0, 0, 0],
                       list_transform(list(g ORDER BY tus)
                           FILTER (WHERE g IS NOT NULL),
                           v -> [CAST(v AS BIGINT), 0, 0])),
                   (acc, e2) -> [
                       GREATEST(0, acc[1] + srvc.s - e2[1]),
                       acc[2] + GREATEST(0, acc[1] + srvc.s
                                         - e2[1]),
                       GREATEST(acc[3],
                                GREATEST(0, acc[1] + srvc.s
                                         - e2[1]))])
                   AS fin
        FROM gaps CROSS JOIN srvc
        GROUP BY day, srvc.s
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_jobs,
           (SELECT s FROM srvc) AS service_us,
           CAST(sum(fin[2]) AS BIGINT) AS sum_wait_us,
           CAST(max(fin[3]) AS BIGINT) AS max_wait_us,
           (CAST(sum(fin[2]) AS DOUBLE)
            / CAST(sum(n) AS DOUBLE)) / 1000000.0e0
               AS mean_wait_s
    FROM perday
    """
    return q, sql


def build_wave143_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_newsvendor",) + _newsvendor_query()))
    add(*(("events_lindley_queue",) + _lindley_query()))
    return queries, oracles
