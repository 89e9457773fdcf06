"""Wave-217 queries: Bhattacharyya affinity, Poisson surprisal.

- events_bhattacharyya_hod: Bhattacharyya coefficient BC = sum_h
  sqrt(p_h q_h) between the hour-of-day profiles of ERRORS vs
  PURCHASES, plus the Bhattacharyya distance -ln BC and the
  Hellinger distance sqrt(1 - BC) — the affinity trio missing next
  to KL/JSD. One sqrt per occupied hour (exact rational product
  inside), fold in hour order.
- events_poisson_surprise: anomaly scoring by Poisson negative
  log-likelihood: with the global daily mean mu = N/D, each day's
  surprisal is -(k ln mu - mu - lgamma(k+1)) using the wave-147
  Lanczos lgamma (bitwise-identical on both engines); emits the 5
  most surprising days (surprisal DESC, day ASC).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols
from .queries_wave147 import _lanczos_lgamma, _sql_lgamma

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
TOP_SURPRISE = 5


def bhattacharyya(p_cnt, q_cnt):
    """(bc, b_dist, hellinger) from integer count profiles."""
    P = sum(p_cnt)
    Q = sum(q_cnt)
    bc = 0.0
    for a, b in zip(p_cnt, q_cnt):
        if a > 0 and b > 0:
            bc = bc + math.sqrt((a / P) * (b / Q))
    bd = -math.log(bc) if bc > 0.0 else float("inf")
    return bc, bd, math.sqrt(max(0.0e0, 1.0e0 - bc))


def poisson_surprisals(day_counts, mu):
    """[(day, k, surprisal)] for all days."""
    out = []
    for d, k in day_counts:
        s = -(k * math.log(mu) - mu - _lanczos_lgamma(k + 1.0))
        out.append((d, k, s))
    return out


# ---------------------------------------- events_bhattacharyya_hod
def _bhatta_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hod = (tus // US_PER_HOUR) % 24
            et = np.asarray(t.column("event_type").to_pylist())
            p = np.bincount(hod[et == "error"],
                            minlength=24).astype(np.int64)
            qq = np.bincount(hod[et == "purchase"],
                             minlength=24).astype(np.int64)
            return pa.table({
                "h": pa.array(np.arange(24, dtype=np.int64)),
                "p": pa.array(p), "q": pa.array(qq),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("h").aggregate(
                [("p", "sum"), ("q", "sum")])
            return pa.table({
                "h": g.column("h").cast(pa.int64()),
                "p": g.column("p_sum").cast(pa.int64()),
                "q": g.column("q_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("h").reset_index(drop=True)
        bc, bd, hel = bhattacharyya(
            [int(v) for v in h["p"]], [int(v) for v in h["q"]])
        return pa.table({
            "bc_coef": pa.array([bc], type=pa.float64()),
            "b_distance": pa.array([bd], type=pa.float64()),
            "hellinger": pa.array([hel], type=pa.float64()),
        })

    sql = f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {US_PER_HOUR}) % 24 AS h,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_p,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END AS is_q
        FROM events
    ),
    prof AS (
        SELECT h, CAST(sum(is_p) AS BIGINT) AS p,
               CAST(sum(is_q) AS BIGINT) AS q
        FROM e GROUP BY h
    ),
    tot AS (
        SELECT CAST(sum(p) AS BIGINT) AS pp,
               CAST(sum(q) AS BIGINT) AS qq
        FROM prof
    ),
    fold AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(CASE WHEN p > 0 AND q > 0
                        THEN sqrt((CAST(p AS DOUBLE)
                              / CAST((SELECT pp FROM tot)
                                     AS DOUBLE))
                             * (CAST(q AS DOUBLE)
                                / CAST((SELECT qq FROM tot)
                                       AS DOUBLE)))
                        ELSE 0.0e0 END ORDER BY h)),
                   (a, x) -> a + x) AS bc
        FROM prof
    )
    SELECT bc AS bc_coef, -ln(bc) AS b_distance,
           sqrt(greatest(0.0e0, 1.0e0 - bc)) AS hellinger
    FROM fold
    """
    return q, sql


# ---------------------------------------------- events_poisson_surprise
def _surprise_query():
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            if tus.size == 0:
                return pa.table({
                    "day": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "lo": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.int64()),
                })
            day = tus // US_PER_DAY
            lo, hi = int(day.min()), int(day.max())
            span = hi - lo + 1
            cnt = np.bincount((day - lo).astype(np.int64),
                              minlength=span).astype(np.int64)
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(cnt),
                "lo": pa.array(np.full(span, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(span, hi,
                                       dtype=np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            import pandas as pd

            df = t.to_pandas()
            lo = int(df["lo"].min())
            hi = int(df["hi"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            g = df.groupby("day")["c"].sum()
            c = np.zeros(grid.size, dtype=np.int64)
            c[g.index.to_numpy(np.int64) - lo] = g.to_numpy(
                np.int64)
            return pa.table({
                "day": pa.array(grid), "c": pa.array(c),
                "lo": pa.array(np.full(grid.size, lo,
                                       dtype=np.int64)),
                "hi": pa.array(np.full(grid.size, hi,
                                       dtype=np.int64)),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        h = h.sort_values("day").reset_index(drop=True)
        days = [(int(r["day"]), int(r["c"]))
                for _, r in h.iterrows()]
        N = sum(k for _, k in days)
        D = len(days)
        mu = N / D
        rows = poisson_surprisals(days, mu)
        rows.sort(key=lambda r: (-r[2], r[0]))
        rows = rows[:TOP_SURPRISE]
        return pa.table({
            "day": pa.array([r[0] for r in rows],
                            type=pa.int64()),
            "count": pa.array([r[1] for r in rows],
                              type=pa.int64()),
            "surprisal": pa.array([r[2] for r in rows],
                                  type=pa.float64()),
        })

    lg = _sql_lgamma("CAST(c + 1 AS DOUBLE)")
    sql = f"""
    WITH e AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day, CAST(coalesce(c.cnt, 0) AS BIGINT) AS c
        FROM grid g LEFT JOIN (
            SELECT day, count(*) AS cnt FROM e GROUP BY day
        ) c ON g.day = c.day
    ),
    mm AS (
        SELECT CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                   AS mu
        FROM d
    ),
    scored AS (
        SELECT day, c,
               -(CAST(c AS DOUBLE) * ln(mm.mu) - mm.mu
                 - {lg}) AS s
        FROM d CROSS JOIN mm
    ),
    pick AS (
        SELECT day, c, s,
               row_number() OVER (ORDER BY s DESC, day ASC)
                   AS rk
        FROM scored
    )
    SELECT day, c AS count, s AS surprisal
    FROM pick WHERE rk <= {TOP_SURPRISE}
    """
    return q, sql


def build_wave217_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_bhattacharyya_hod",) + _bhatta_query()))
    add(*(("events_poisson_surprise",) + _surprise_query()))
    return queries, oracles
