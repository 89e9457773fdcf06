"""Wave-277 query: TOST equivalence test.

lineitem_tost_equivalence: the two-one-sided-tests procedure for
EQUIVALENCE of mean extended price between low-discount (≤ 0.05)
and high-discount lineitems, with margin δ = 1% of the pooled mean.
All inputs are exact integer moments (cents); the Welch standard
error, both one-sided t statistics and the z-based verdict
(min(t) > 1.645) are identical float expressions on both sides.
Equivalence testing inverts the difference-test family: here a
SIGNIFICANT result means the means are provably close.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

Z_90 = 1.6448536269514722  # qnorm(0.95), fixed constant both sides


def tost(n1, s1, q1, n2, s2, q2):
    """(d, delta, se, t_lower, t_upper, equivalent) from integer
    count/sum/sumsq per group."""
    f1, f2 = float(n1), float(n2)
    m1 = float(s1) / f1
    m2 = float(s2) / f2
    d = m1 - m2
    delta = 0.01 * (float(s1 + s2) / (f1 + f2))
    v1 = float(n1 * q1 - s1 * s1) / (f1 * f1 * (f1 - 1.0))
    v2 = float(n2 * q2 - s2 * s2) / (f2 * f2 * (f2 - 1.0))
    se = math.sqrt(v1 + v2)
    t_lower = (d + delta) / se
    t_upper = (delta - d) / se
    eq = 1 if (t_lower > Z_90 and t_upper > Z_90) else 0
    return d, delta, se, t_lower, t_upper, eq


def _tost_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_discount", "l_extendedprice"])
        disc = t.column("l_discount").to_numpy(
            zero_copy_only=False)
        cents = np.round(
            t.column("l_extendedprice").to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)
        lo = disc <= 0.05
        n1 = int(lo.sum())
        n2 = int((~lo).sum())
        s1 = int(cents[lo].sum())
        s2 = int(cents[~lo].sum())
        q1 = int((cents[lo].astype(object) ** 2).sum())
        q2 = int((cents[~lo].astype(object) ** 2).sum())
        d, delta, se, tl, tu, eq = tost(n1, s1, q1, n2, s2, q2)
        return pa.table({
            "n_low": pa.array([n1], type=pa.int64()),
            "n_high": pa.array([n2], type=pa.int64()),
            "mean_diff": pa.array([d], type=pa.float64()),
            "margin": pa.array([delta], type=pa.float64()),
            "t_lower": pa.array([tl], type=pa.float64()),
            "t_upper": pa.array([tu], type=pa.float64()),
            "equivalent": pa.array([eq], type=pa.int64()),
        })

    sql = f"""
    WITH base AS (
        SELECT CASE WHEN l_discount <= 0.05 THEN 0 ELSE 1 END
                   AS grp,
               CAST(round_even(l_extendedprice * 100, 0)
                    AS BIGINT) AS y
        FROM lineitem
    ),
    g AS (
        SELECT grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS q
        FROM base GROUP BY grp
    ),
    w AS (
        SELECT
            (SELECT n FROM g WHERE grp = 0) AS n1,
            (SELECT s FROM g WHERE grp = 0) AS s1,
            (SELECT q FROM g WHERE grp = 0) AS q1,
            (SELECT n FROM g WHERE grp = 1) AS n2,
            (SELECT s FROM g WHERE grp = 1) AS s2,
            (SELECT q FROM g WHERE grp = 1) AS q2
    ),
    f AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS d,
               0.01 * (CAST(s1 + s2 AS DOUBLE)
                       / (CAST(n1 AS DOUBLE)
                          + CAST(n2 AS DOUBLE))) AS delta,
               sqrt(CAST(CAST(n1 AS HUGEINT) * q1
                         - CAST(s1 AS HUGEINT) * s1 AS DOUBLE)
                    / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                       * (CAST(n1 AS DOUBLE) - 1.0))
                    + CAST(CAST(n2 AS HUGEINT) * q2
                           - CAST(s2 AS HUGEINT) * s2 AS DOUBLE)
                      / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
                         * (CAST(n2 AS DOUBLE) - 1.0))) AS se
        FROM w
    )
    SELECT n1 AS n_low, n2 AS n_high,
           d AS mean_diff,
           delta AS margin,
           (d + delta) / se AS t_lower,
           (delta - d) / se AS t_upper,
           CAST(CASE WHEN (d + delta) / se > {Z_90!r}
                      AND (delta - d) / se > {Z_90!r}
                     THEN 1 ELSE 0 END AS BIGINT) AS equivalent
    FROM f
    """
    return q, sql


def build_wave277_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("lineitem_tost_equivalence",) + _tost_query()))
    return queries, oracles
