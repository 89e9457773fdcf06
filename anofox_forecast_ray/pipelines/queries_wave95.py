"""Wave-95 query: circular (directional) statistics of event times.

- events_circular_stats: per event type, the circular mean direction
  and resultant length of time-of-day angles theta = 2*pi*
  minute_of_day/1440 (Mardia directional statistics — the correct
  way to average "what time of day does this happen"; a 23:00/01:00
  mix averages to midnight, not noon). Scale-clean formulation:
  events reduce to BOUNDED (type, minute-of-day) integer cells; the
  cos/sin sums fold over the 1440 cells in minute order with one
  scalar trig call per OBSERVED cell; mean_hour = atan2 (shared
  libm) mapped to [0, 24); R = resultant length (1 = perfectly
  peaked, 0 = uniform).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _cast, _num_read_blocks
from ._scaffold import read_cols


def _circular_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            if "ts" not in t.column_names or t.num_rows == 0:
                return pa.table({
                    "event_type": pa.array([], type=pa.string()),
                    "minute": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                })
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            minute = (tus // 60_000_000) % 1440
            et = np.asarray(t.column("event_type").to_pylist())
            names, inv = np.unique(et, return_inverse=True)
            keys = inv.astype(np.int64) * 1440 + minute
            uk, cnt = np.unique(keys, return_counts=True)
            return pa.table({
                "event_type": pa.array(names[uk // 1440],
                                       type=pa.string()),
                "minute": pa.array(uk % 1440),
                "cnt": pa.array(cnt.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["event_type", "minute"]).aggregate(
                [("cnt", "sum")])
            return pa.table({
                "event_type": g.column("event_type"),
                "minute": g.column("minute").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        a = tree_reduce_tables(refs, merge).to_pandas()
        a = a.sort_values(["event_type", "minute"]).reset_index(
            drop=True)
        rows = []
        for et, grp in a.groupby("event_type", sort=True):
            n = 0
            cs = 0.0
            sn = 0.0
            for r in grp.itertuples():  # ascending minute fold
                cnt = int(r.cnt)
                ang = (2.0 * math.pi * float(int(r.minute))
                       / 1440.0)
                cs = cs + float(cnt) * math.cos(ang)
                sn = sn + float(cnt) * math.sin(ang)
                n += cnt
            rbar = math.sqrt(cs * cs + sn * sn) / float(n)
            mean_ang = math.atan2(sn, cs)
            mean_hour = mean_ang * 24.0 / (2.0 * math.pi)
            if mean_hour < 0:
                mean_hour = mean_hour + 24.0
            rows.append((et, n, mean_hour, rbar))
        return pa.table({
            "event_type": pa.array([r[0] for r in rows],
                                   type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "mean_hour": pa.array([r[2] for r in rows],
                                  type=pa.float64()),
            "resultant_r": pa.array([r[3] for r in rows],
                                    type=pa.float64()),
        })

    sql = """
    WITH c AS (
        SELECT event_type,
               (epoch_us(ts) // 60000000) % 1440 AS minute,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, minute
    ),
    f AS (
        SELECT event_type,
               CAST(sum(cnt) AS BIGINT) AS n,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(cnt AS DOUBLE)
                        * cos(2.0e0 * pi()
                              * CAST(minute AS DOUBLE)
                              / 1440.0e0) ORDER BY minute)),
                   (a, b) -> a + b) AS cs,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(cnt AS DOUBLE)
                        * sin(2.0e0 * pi()
                              * CAST(minute AS DOUBLE)
                              / 1440.0e0) ORDER BY minute)),
                   (a, b) -> a + b) AS sn
        FROM c GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN atan2(sn, cs) * 24.0e0 / (2.0e0 * pi()) < 0
                THEN atan2(sn, cs) * 24.0e0 / (2.0e0 * pi())
                     + 24.0e0
                ELSE atan2(sn, cs) * 24.0e0 / (2.0e0 * pi())
           END AS mean_hour,
           sqrt(cs * cs + sn * sn) / CAST(n AS DOUBLE)
               AS resultant_r
    FROM f
    """
    return q, sql


def build_wave95_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_circular_stats",) + _circular_query()))
    return queries, oracles
