"""Wave-265 queries: seasonal ESD anomalies and greedy k-center.

events_seasonal_esd: the S-H-ESD composition (Twitter's anomaly
recipe): deseasonalize daily error counts by the day-of-week median
— doubled group medians keep the residual r_d = 2·x_d − med2_{dow}
an exact integer — then run the wave-261 generalized ESD cascade
(k=3) on the residuals.  Selection order and studentized R_i are
bitwise deterministic for the same reasons as events_gesd_outliers.

part_kcenter_prices: greedy 2-approximation k-center (k=3) on the
DISTINCT part retail prices in exact cents — first center is the
lower median of distinct values; each next center is the integer
argmax of the min-distance to chosen centers (ties → smallest
value); the reported radius is the final max-min coverage distance.
Every comparison is integer, so the chosen centers are exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .queries_wave261 import gesd

US_PER_DAY = 86_400_000_000


def dow_residuals(x, days):
    """r_d = 2*x_d - med2(dow group) — integer deseasonalization."""
    groups = {}
    for xv, d in zip(x, days):
        groups.setdefault(d % 7, []).append(xv)
    med2 = {}
    for w, vals in groups.items():
        s = sorted(vals)
        m = len(s)
        med2[w] = s[(m - 1) // 2] + s[m // 2]
    return [2 * xv - med2[d % 7] for xv, d in zip(x, days)]


def kcenter_prices(vals, k=3):
    """(centers, radius) — greedy on sorted distinct ints."""
    vs = sorted(set(vals))
    n = len(vs)
    centers = [vs[(n + 1) // 2 - 1]]       # lower median
    for _ in range(k - 1):
        best = None
        for v in vs:
            dmin = min(abs(v - c) for c in centers)
            if best is None or dmin > best[0]:
                best = (dmin, v)           # ascending v: first max
        centers.append(best[1])
    radius = max(min(abs(v - c) for c in centers) for v in vs)
    return centers, radius


# ------------------------------------------------ events_seasonal_esd
def _sesd_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, _ = _daily_ep(sf_dir)
        x = [int(v) for v in e]
        # absolute epoch day anchors the dow grouping; _daily_ep's
        # grid starts at the data's first day
        import pyarrow.parquet as pq

        ts = pq.read_table(f"{sf_dir}/events.parquet",
                           columns=["ts"]).column("ts")
        lo = int(ts.cast(pa.int64()).to_numpy(
            zero_copy_only=False).min()) // US_PER_DAY
        days = [lo + i for i in range(len(x))]
        r = dow_residuals(x, days)
        rounds = gesd(r)
        cols = {}
        for i, (idx, rr) in enumerate(rounds, start=1):
            cols[f"day{i}"] = pa.array([idx], type=pa.int64())
            cols[f"r{i}"] = pa.array([rr], type=pa.float64())
        return pa.table(cols)

    def round_cte(prev_set: str, tag: str) -> str:
        return f"""
    s{tag} AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS ss
        FROM {prev_set}
    ),
    m{tag} AS (
        SELECT a.i AS day, abs(s{tag}.n * a.y - s{tag}.s) AS d,
               s{tag}.n AS n, s{tag}.s AS s, s{tag}.ss AS ss
        FROM {prev_set} a CROSS JOIN s{tag}
        ORDER BY abs(s{tag}.n * a.y - s{tag}.s) DESC, a.i ASC
        LIMIT 1
    )"""

    def r_expr(tag: str) -> str:
        return f"""
        CASE WHEN m{tag}.n * m{tag}.ss - m{tag}.s * m{tag}.s = 0
             THEN 0.0
             ELSE (CAST(m{tag}.d AS DOUBLE)
                   / CAST(m{tag}.n AS DOUBLE))
        / sqrt(CAST(m{tag}.n * m{tag}.ss
                    - m{tag}.s * m{tag}.s AS DOUBLE)
               / (CAST(m{tag}.n AS DOUBLE)
                  * (CAST(m{tag}.n AS DOUBLE) - 1.0))) END"""

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day,
               g.day - (SELECT lo FROM span) AS i,
               g.day % 7 AS dow,
               CAST(coalesce(c.e, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    ranked AS (
        SELECT dow, x,
               row_number() OVER (PARTITION BY dow
                                  ORDER BY x) AS r,
               count(*) OVER (PARTITION BY dow) AS m
        FROM d
    ),
    meds AS (
        SELECT a.dow, a.x + b.x AS med2
        FROM ranked a JOIN ranked b
          ON a.dow = b.dow
         AND a.r = (a.m - 1) // 2 + 1
         AND b.r = b.m // 2 + 1
    ),
    a0 AS (
        SELECT d.i, 2 * d.x - meds.med2 AS y
        FROM d JOIN meds ON d.dow = meds.dow
    ),{round_cte('a0', '1')},
    a1 AS (
        SELECT i, y FROM a0 WHERE i <> (SELECT day FROM m1)
    ),{round_cte('a1', '2')},
    a2 AS (
        SELECT i, y FROM a1 WHERE i <> (SELECT day FROM m2)
    ),{round_cte('a2', '3')}
    SELECT m1.day AS day1, {r_expr('1')} AS r1,
           m2.day AS day2, {r_expr('2')} AS r2,
           m3.day AS day3, {r_expr('3')} AS r3
    FROM m1 CROSS JOIN m2 CROSS JOIN m3
    """
    return q, sql


# ----------------------------------------------- part_kcenter_prices
def _kcenter_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/part.parquet",
                          columns=["p_retailprice"])
        cents = np.round(
            t.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        centers, radius = kcenter_prices([int(v) for v in cents])
        return pa.table({
            "c1": pa.array([centers[0]], type=pa.int64()),
            "c2": pa.array([centers[1]], type=pa.int64()),
            "c3": pa.array([centers[2]], type=pa.int64()),
            "radius": pa.array([radius], type=pa.int64()),
        })

    sql = """
    WITH vals AS (
        SELECT DISTINCT CAST(round_even(p_retailprice * 100, 0)
                             AS BIGINT) AS v
        FROM part
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    c1 AS (
        SELECT v FROM vals ORDER BY v
        LIMIT 1 OFFSET (((SELECT n FROM nn) + 1) // 2 - 1)
    ),
    c2 AS (
        SELECT v FROM vals
        ORDER BY abs(v - (SELECT v FROM c1)) DESC, v ASC
        LIMIT 1
    ),
    c3 AS (
        SELECT v FROM vals
        ORDER BY least(abs(v - (SELECT v FROM c1)),
                       abs(v - (SELECT v FROM c2))) DESC, v ASC
        LIMIT 1
    )
    SELECT (SELECT v FROM c1) AS c1,
           (SELECT v FROM c2) AS c2,
           (SELECT v FROM c3) AS c3,
           (SELECT CAST(max(least(abs(v - (SELECT v FROM c1)),
                                  abs(v - (SELECT v FROM c2)),
                                  abs(v - (SELECT v FROM c3))))
                   AS BIGINT)
            FROM vals) AS radius
    """
    return q, sql


def build_wave265_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_seasonal_esd",) + _sesd_query()))
    add(*(("part_kcenter_prices",) + _kcenter_query()))
    return queries, oracles
