"""Wave-239 query: mean residual life curve.

events_mean_residual_life: the MRL (mean-excess) curve — the
diagnostic that picks the GPD threshold (wave 210): at each decile
threshold u in {P50, P60, P70, P80, P90} of the hourly counts
(exact integer order statistics, rank ceil(q n)), MRL(u) =
(sum of counts above u - n_above * u) / n_above — a pure int64
numerator and one division per row. A linear-in-u MRL confirms the
GPD regime; emits the 5 (q, u, n_exceed, mrl) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries_wave137 import _hourly_counts

MRL_QS = (5, 6, 7, 8, 9)  # tenths


def mrl_rows(x):
    """[(q10, u, n_above, mrl)] exact ints + one division each."""
    xs = sorted(int(v) for v in x)
    n = len(xs)
    out = []
    for q in MRL_QS:
        r = (q * n + 9) // 10  # ceil(q/10 * n)
        u = xs[r - 1]
        above = [v for v in xs if v > u]
        na = len(above)
        sa = sum(above)
        out.append((q, u, na, (sa - na * u) / na))
    return out


# ---------------------------------------- events_mean_residual_life
def _mrl_query():
    def q(sf_dir: str):
        import ray.data as rd

        x = [int(v) for v in _hourly_counts(sf_dir)]
        rows = mrl_rows(x)
        tbl = pa.table({
            "q_tenths": pa.array([r[0] for r in rows],
                                 type=pa.int64()),
            "threshold_u": pa.array([r[1] for r in rows],
                                    type=pa.int64()),
            "n_exceed": pa.array([r[2] for r in rows],
                                 type=pa.int64()),
            "mrl": pa.array([r[3] for r in rows],
                            type=pa.float64()),
        })
        return rd.from_arrow(tbl)

    US_PER_HOUR = 3_600_000_000
    per_q = " UNION ALL ".join(f"""
        SELECT CAST({q} AS BIGINT) AS q_tenths,
               (SELECT cnt FROM ranked
                WHERE r = ({q} * (SELECT n FROM nn) + 9) // 10)
                   AS threshold_u,
               (SELECT CAST(count(*) AS BIGINT) FROM grid
                WHERE cnt > (SELECT cnt FROM ranked
                    WHERE r = ({q} * (SELECT n FROM nn) + 9)
                              // 10)) AS n_exceed,
               CAST((SELECT sum(cnt) FROM grid
                     WHERE cnt > (SELECT cnt FROM ranked
                         WHERE r = ({q} * (SELECT n FROM nn)
                                    + 9) // 10))
                    - (SELECT count(*) FROM grid
                       WHERE cnt > (SELECT cnt FROM ranked
                           WHERE r = ({q} * (SELECT n FROM nn)
                                      + 9) // 10))
                      * (SELECT cnt FROM ranked
                         WHERE r = ({q} * (SELECT n FROM nn)
                                    + 9) // 10) AS DOUBLE)
               / CAST((SELECT count(*) FROM grid
                       WHERE cnt > (SELECT cnt FROM ranked
                           WHERE r = ({q} * (SELECT n FROM nn)
                                      + 9) // 10)) AS DOUBLE)
                   AS mrl""" for q in MRL_QS)
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT g.h AS hour,
               CAST(COALESCE(hc.cnt, 0) AS BIGINT) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grid),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt) AS r
        FROM grid
    )
    {per_q}
    """
    return q, sql


def build_wave239_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_mean_residual_life",) + _mrl_query()))
    return queries, oracles
