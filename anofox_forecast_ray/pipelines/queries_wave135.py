"""Wave-135 queries: capture-recapture, GEV fit via L-moments.

- events_capture_recapture: Lincoln-Petersen / Chapman population
  estimate from two 6-hour observation windows on day 2. The only
  things that leave tasks are distinct (window, user) pairs; the
  Chapman estimator (n1+1)(n2+1)/(m+1) - 1 and its variance are
  exact integer ratios with one division each.
- events_gev_daily_max: Generalized Extreme Value fit to the daily
  maxima of hourly counts via Hosking's L-moment estimators. The
  probability-weighted moments are exact HUGEINT falling-factorial
  sums over the sorted maxima; the shape uses the classic
  k = 7.8590c + 2.9554c^2 with c = 2/(3+tau3) - ln2/ln3, and
  Gamma(1+k) is a LANCZOS (g=7, n=9) evaluation spelled
  term-for-term in both the engine and the SQL — DuckDB's builtin
  gamma() does NOT bit-match libm (probed), but power/exp/ln/sqrt
  do, so the shared rational sum reproduces bitwise. Also reports
  the 100-block return level.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000
CR_DAY = 2          # observation day for capture-recapture
CR_W_HOURS = 6      # window width in hours
GEV_T = 100         # return period in blocks (days)

LANCZOS = [
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
]


def _lanczos_gamma(z: float) -> float:
    """Lanczos Gamma for z >= 0.5, spelled exactly as the SQL does."""
    x = LANCZOS[0]
    for i in range(1, 9):
        x = x + LANCZOS[i] / (z + float(i) - 1.0)
    t = z + 6.5
    return (math.sqrt(2.0 * math.pi)
            * math.pow(t, z - 0.5) * math.exp(-t) * x)


def _sql_gamma(zexpr: str) -> str:
    """SQL expression for the same Lanczos evaluation of Gamma(z)."""
    terms = " + ".join(
        f"{LANCZOS[i]!r} / (({zexpr}) + {float(i)!r} - 1.0e0)"
        for i in range(1, 9)
    )
    return (f"(sqrt(2.0e0 * pi()) "
            f"* power(({zexpr}) + 6.5e0, ({zexpr}) - 0.5e0) "
            f"* exp(-(({zexpr}) + 6.5e0)) "
            f"* ({LANCZOS[0]!r} + {terms}))")


# ----------------------------------------------- events_capture_recapture
def _capture_query(day: int = CR_DAY, w: int = CR_W_HOURS):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "w": pa.array([], type=pa.int64()),
                "uid": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            uid = t.column("user_id").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            # absolute epoch hour; made day-relative on the driver
            # (min-hour // 24 == min-day, so every block agrees)
            hour = tus // US_PER_HOUR
            key = hour * np.int64(1 << 20) + uid
            uk = np.unique(key)
            return pa.table({
                "w": pa.array(uk // (1 << 20)),
                "uid": pa.array(uk % (1 << 20)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by(["w", "uid"]).aggregate([])
            return pa.table({
                "w": g.column("w").cast(pa.int64()),
                "uid": g.column("uid").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts", "user_id"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        pairs = tree_reduce_tables(refs, merge).to_pandas()
        # absolute hour -> relative to the corpus min day
        d0 = int(pairs["w"].min()) // 24
        rel_h = pairs["w"].to_numpy(np.int64) - d0 * 24
        uid = pairs["uid"].to_numpy(np.int64)
        lo1 = day * 24
        s1 = set(uid[(rel_h >= lo1)
                     & (rel_h < lo1 + w)].tolist())
        s2 = set(uid[(rel_h >= lo1 + w)
                     & (rel_h < lo1 + 2 * w)].tolist())
        n1 = len(s1)
        n2 = len(s2)
        m = len(s1 & s2)
        n_hat = (float((n1 + 1) * (n2 + 1))
                 / float(m + 1)) - 1.0
        var = (float((n1 + 1) * (n2 + 1))
               * float((n1 - m) * (n2 - m))) \
            / (float((m + 1) * (m + 1)) * float(m + 2))
        return pa.table({
            "n1": pa.array([n1], type=pa.int64()),
            "n2": pa.array([n2], type=pa.int64()),
            "m_both": pa.array([m], type=pa.int64()),
            "n_hat": pa.array([n_hat], type=pa.float64()),
            "var_hat": pa.array([var], type=pa.float64()),
        })

    sql = f"""
    WITH base AS (
        SELECT user_id,
               epoch_us(ts) // {US_PER_HOUR}
                   - (SELECT min(epoch_us(ts))
                      // {US_PER_DAY} FROM events) * 24
                   AS rel_h
        FROM events
    ),
    s1 AS (SELECT DISTINCT user_id FROM base
           WHERE rel_h >= {day * 24}
             AND rel_h < {day * 24 + w}),
    s2 AS (SELECT DISTINCT user_id FROM base
           WHERE rel_h >= {day * 24 + w}
             AND rel_h < {day * 24 + 2 * w}),
    cnts AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n1,
               (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n2,
               (SELECT CAST(count(*) AS BIGINT) FROM s1
                WHERE user_id IN (SELECT user_id FROM s2))
                   AS m
    )
    SELECT n1, n2, m AS m_both,
           (CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
            / CAST(m + 1 AS DOUBLE)) - 1.0e0 AS n_hat,
           (CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
            * CAST((n1 - m) * (n2 - m) AS DOUBLE))
           / (CAST((m + 1) * (m + 1) AS DOUBLE)
              * CAST(m + 2 AS DOUBLE)) AS var_hat
    FROM cnts
    """
    return q, sql


# ------------------------------------------------- events_gev_daily_max
def _gev_query(t_ret: int = GEV_T):
    def q(sf_dir: str):
        import ray.data as rd

        from ..stages.source_rollup import tree_reduce_tables

        def partial(t: pa.Table) -> pa.Table:
            empty = pa.table({
                "hour": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            })
            if "ts" not in t.column_names or t.num_rows == 0:
                return empty
            tus = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = tus // US_PER_HOUR
            uh, c = np.unique(hour, return_counts=True)
            return pa.table({
                "hour": pa.array(uh.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
            })

        def merge(t: pa.Table) -> pa.Table:
            g = t.group_by("hour").aggregate([("cnt", "sum")])
            return pa.table({
                "hour": g.column("hour").cast(pa.int64()),
                "cnt": g.column("cnt_sum").cast(pa.int64()),
            })

        refs = list(
            read_cols(sf_dir, "events", ["ts"])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        h = tree_reduce_tables(refs, merge).to_pandas()
        day = h["hour"].to_numpy(np.int64) // 24
        mx = h.groupby(day)["cnt"].max()
        xs = sorted(int(v) for v in mx)
        n = len(xs)
        nf = float(n)

        b0n = sum(xs)
        b1n = sum((i) * xs[i] for i in range(n))          # (i-1) 0-based
        b2n = sum((i) * (i - 1) * xs[i] for i in range(n))
        b0 = float(b0n) / nf
        b1 = float(b1n) / float(n * (n - 1))
        b2 = float(b2n) / float(n * (n - 1) * (n - 2))
        l2 = 2.0 * b1 - b0
        tau3 = (6.0 * b2 - 6.0 * b1 + b0) / l2
        c = 2.0 / (3.0 + tau3) \
            - math.log(2.0) / math.log(3.0)
        k = 7.8590 * c + 2.9554 * c * c
        g1k = _lanczos_gamma(1.0 + k)
        sigma = (l2 * k) / ((1.0 - math.pow(2.0, -k)) * g1k)
        mu = b0 - sigma * (g1k - 1.0) / k
        # T-block return level
        yt = -math.log(1.0 - 1.0 / float(t_ret))
        x_t = mu + (sigma / k) * (1.0 - math.pow(yt, k))
        return pa.table({
            "n_blocks": pa.array([n], type=pa.int64()),
            "l1": pa.array([b0], type=pa.float64()),
            "l2": pa.array([l2], type=pa.float64()),
            "tau3": pa.array([tau3], type=pa.float64()),
            "shape_k": pa.array([k], type=pa.float64()),
            "scale": pa.array([sigma], type=pa.float64()),
            "loc": pa.array([mu], type=pa.float64()),
            "ret_level": pa.array([x_t], type=pa.float64()),
        })

    gz = _sql_gamma("1.0e0 + kk.k")
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    dm AS (
        SELECT hour // 24 AS day, max(cnt) AS mx
        FROM hc GROUP BY 1
    ),
    seq AS (
        SELECT CAST(row_number() OVER (ORDER BY mx, day)
                    AS HUGEINT) AS i,
               CAST(mx AS HUGEINT) AS x
        FROM dm
    ),
    pwm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) AS b0,
               CAST(sum((i - 1) * x) AS DOUBLE)
                   / CAST(count(*) * (count(*) - 1) AS DOUBLE)
                   AS b1,
               CAST(sum((i - 1) * (i - 2) * x) AS DOUBLE)
                   / CAST(count(*) * (count(*) - 1)
                          * (count(*) - 2) AS DOUBLE) AS b2
        FROM seq
    ),
    lmom AS (
        SELECT n, b0,
               2.0e0 * b1 - b0 AS l2,
               (6.0e0 * b2 - 6.0e0 * b1 + b0)
                   / (2.0e0 * b1 - b0) AS tau3
        FROM pwm
    ),
    kk AS (
        SELECT n, b0, l2, tau3,
               7.8590e0 * (2.0e0 / (3.0e0 + tau3)
                           - ln(2.0e0) / ln(3.0e0))
               + 2.9554e0 * (2.0e0 / (3.0e0 + tau3)
                             - ln(2.0e0) / ln(3.0e0))
                 * (2.0e0 / (3.0e0 + tau3)
                    - ln(2.0e0) / ln(3.0e0)) AS k
        FROM lmom
    ),
    fit AS (
        SELECT kk.n, kk.b0, kk.l2, kk.tau3, kk.k,
               (kk.l2 * kk.k)
                   / ((1.0e0 - power(2.0e0, -kk.k)) * {gz})
                   AS sigma,
               {gz} AS g1k
        FROM kk
    )
    SELECT n AS n_blocks,
           b0 AS l1,
           l2,
           tau3,
           k AS shape_k,
           sigma AS scale,
           b0 - sigma * (g1k - 1.0e0) / k AS loc,
           (b0 - sigma * (g1k - 1.0e0) / k)
               + (sigma / k)
                 * (1.0e0 - power(-ln(1.0e0
                       - 1.0e0 / {float(t_ret)!r}), k))
               AS ret_level
    FROM fit
    """
    return q, sql


def build_wave135_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_capture_recapture",) + _capture_query()))
    add(*(("events_gev_daily_max",) + _gev_query()))
    return queries, oracles
