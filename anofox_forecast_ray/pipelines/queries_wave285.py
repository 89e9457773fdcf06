"""Wave-285 query: Neyman allocation with Hamilton rounding.

lineitem_neyman_allocation: the survey-sampling classic — allocate a
budget of 1000 samples across the l_returnflag strata proportionally
to N_h·S_h (Neyman optimum for estimating mean extended price), then
apportion to integers by the largest-remainder (Hamilton) method
with deterministic ties (larger remainder first, then flag order).
Stratum standard deviations come from exact integer cents moments;
quotas, floors and remainders are identical float expressions, so
the integer seat vector is bitwise reproducible.  Also emits the
design-effect proxy: Neyman vs proportional-allocation variance
ratio (≤ 1 by Cauchy-Schwarz, checked).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

BUDGET = 1000


def neyman_allocation(strata):
    """rows (flag, n_h, weight, quota, seats) + var ratio;
    strata = sorted list of (flag, n, s, q) integer moments."""
    ws = []
    for flag, n, s, qq in strata:
        fn = float(n)
        sd = math.sqrt(float(n * qq - s * s)
                       / (fn * (fn - 1.0)))
        ws.append((flag, n, fn * sd))
    tot = 0.0
    for _, _, w in ws:
        tot = tot + w
    quotas = [(flag, n, w, float(BUDGET) * (w / tot))
              for flag, n, w in ws]
    floors = [(flag, n, w, qt, int(qt)) for flag, n, w, qt
              in quotas]
    used = sum(f for *_, f in floors)
    rem = BUDGET - used
    order = sorted(floors,
                   key=lambda r: (-(r[3] - float(r[4])), r[0]))
    bump = {r[0] for r in order[:rem]}
    rows = [(flag, n, w, qt, f + (1 if flag in bump else 0))
            for flag, n, w, qt, f in floors]
    # variance ratio: Neyman vs proportional, (Σ N_h S_h)^2/(N ΣN_h S_h^2)
    nn = sum(n for _, n, _ in ws)
    num = tot * tot
    den = 0.0
    for flag, n, w in ws:
        den = den + float(n) * ((w / float(n)) * (w / float(n)))
    ratio = num / (float(nn) * den)
    return rows, ratio


def _neyman_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice"])
        flags = t.column("l_returnflag").to_pylist()
        cents = np.round(
            t.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
        agg = {}
        for f, c in zip(flags, cents):
            g = agg.setdefault(f, [0, 0, 0])
            c = int(c)
            g[0] += 1
            g[1] += c
            g[2] += c * c
        strata = [(f, *agg[f]) for f in sorted(agg)]
        rows, ratio = neyman_allocation(strata)
        return pa.table({
            "flag": pa.array([r[0] for r in rows],
                             type=pa.string()),
            "n_stratum": pa.array([r[1] for r in rows],
                                  type=pa.int64()),
            "quota": pa.array([r[3] for r in rows],
                              type=pa.float64()),
            "n_alloc": pa.array([r[4] for r in rows],
                                type=pa.int64()),
            "neyman_var_ratio": pa.array(
                [ratio] * len(rows), type=pa.float64()),
        })

    sql = f"""
    WITH base AS (
        SELECT l_returnflag AS flag,
               CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) AS y
        FROM lineitem
    ),
    g AS (
        SELECT flag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS qq
        FROM base GROUP BY flag
    ),
    w AS (
        SELECT flag, n,
               CAST(n AS DOUBLE)
               * sqrt(CAST(CAST(n AS HUGEINT) * qq
                           - CAST(s AS HUGEINT) * s AS DOUBLE)
                      / (CAST(n AS DOUBLE)
                         * (CAST(n AS DOUBLE) - 1.0))) AS wt
        FROM g
    ),
    tot AS (
        SELECT list_reduce(list_prepend(0.0e0,
                   list(wt ORDER BY flag)), (a, b) -> a + b)
                   AS tw,
               CAST(sum(n) AS BIGINT) AS nn
        FROM w
    ),
    quotas AS (
        SELECT w.flag, w.n, w.wt,
               {float(BUDGET)!r} * (w.wt / tot.tw) AS quota
        FROM w CROSS JOIN tot
    ),
    floors AS (
        SELECT flag, n, wt, quota,
               CAST(trunc(quota) AS BIGINT) AS fl,
               quota - CAST(CAST(trunc(quota) AS BIGINT)
                            AS DOUBLE) AS remv
        FROM quotas
    ),
    rem AS (
        SELECT {BUDGET} - CAST(sum(fl) AS BIGINT) AS k
        FROM floors
    ),
    ranked AS (
        SELECT flag,
               row_number() OVER (ORDER BY remv DESC, flag ASC)
                   AS rk
        FROM floors
    ),
    ratio AS (
        SELECT (tot.tw * tot.tw)
               / (CAST(tot.nn AS DOUBLE)
                  * (SELECT list_reduce(list_prepend(0.0e0,
                         list(CAST(n AS DOUBLE)
                              * ((wt / CAST(n AS DOUBLE))
                                 * (wt / CAST(n AS DOUBLE)))
                              ORDER BY flag)),
                         (a, b) -> a + b) FROM w)) AS r
        FROM tot
    )
    SELECT f.flag,
           f.n AS n_stratum,
           f.quota,
           f.fl + CASE WHEN rk.rk <= (SELECT k FROM rem)
                       THEN 1 ELSE 0 END AS n_alloc,
           (SELECT r FROM ratio) AS neyman_var_ratio
    FROM floors f JOIN ranked rk ON f.flag = rk.flag
    ORDER BY f.flag
    """
    return q, sql


def build_wave285_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_neyman_allocation",) + _neyman_query()))
    return queries, oracles
