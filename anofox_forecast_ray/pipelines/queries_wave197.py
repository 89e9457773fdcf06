"""Wave-197 queries: Cucconi and Lepage location-scale tests.

Completing the two-sample family (MWU location, Ansari-Bradley
scale) with the two classic JOINT location-scale tests, over the
same src0-vs-src1 doc-length samples and the same bounded pooled
histogram (wave-180 machinery):

- source_cucconi: Cucconi's C from squared midranks. With doubled
  midranks m2 (ties exact), sum R^2 over sample B is the exact
  integer S2 = sum c1*m2^2 divided by 4, so the U numerator
  6*sumR2 - n2(N+1)(2N+1) is the exact integer
  (6*S2 - 4*n2(N+1)(2N+1))/4; V uses contrary ranks (doubled:
  2(N+1) - m2). C = (U^2 + V^2 - 2 rho U V)/(2(1 - rho^2)) with
  rho = 2(N^2-4)/((2N+1)(8N+11)) - 1.
- source_lepage: L = z_W^2 + z_AB^2 — the Wilcoxon z with the
  standard tie-corrected variance (n1 n2/12)((N+1) -
  sum(t^3-t)/(N(N-1))) plus the wave-180 Ansari-Bradley z,
  recomputed with identical spelling.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries_wave180 import (
    _SQL_HIST,
    _two_source_hist,
    ab_from_hist,
)


def cucconi_from_hist(c0: np.ndarray, c1: np.ndarray):
    """(u, v, c) from per-value counts ascending; exact-int cores."""
    cv = c0 + c1
    n1 = int(c0.sum())
    n2 = int(c1.sum())
    n = n1 + n2
    cum = np.cumsum(cv)
    before = np.concatenate(([0], cum[:-1]))
    m2 = 2 * before + cv + 1  # doubled midranks
    s2 = int((c1 * m2 * m2).sum())
    m2c = 2 * (n + 1) - m2    # doubled contrary ranks
    s2c = int((c1 * m2c * m2c).sum())
    num_u = 6 * s2 - 4 * n2 * (n + 1) * (2 * n + 1)
    num_v = 6 * s2c - 4 * n2 * (n + 1) * (2 * n + 1)
    den = ((n1 * n2) * float((n + 1) * (2 * n + 1))
           * (8 * n + 11) / 5.0e0)
    u = num_u / 4.0e0 / math.sqrt(den)
    v = num_v / 4.0e0 / math.sqrt(den)
    rho = (2.0e0 * ((n * n) - 4)
           / float((2 * n + 1) * (8 * n + 11)) - 1.0e0)
    c = ((u * u + v * v - 2.0e0 * rho * u * v)
         / (2.0e0 * (1.0e0 - rho * rho)))
    return u, v, c


def wilcoxon_z_from_hist(c0: np.ndarray, c1: np.ndarray):
    """Tie-corrected Wilcoxon rank-sum z for sample A."""
    cv = c0 + c1
    n1 = int(c0.sum())
    n2 = int(c1.sum())
    n = n1 + n2
    cum = np.cumsum(cv)
    before = np.concatenate(([0], cum[:-1]))
    m2 = 2 * before + cv + 1
    sw = int((c0 * m2).sum())  # 2*W
    t3 = int((cv * cv * cv - cv).sum())
    num = (sw - n1 * (n + 1)) / 2.0e0
    var = ((n1 * n2) / 12.0e0
           * (float(n + 1) - float(t3) / float(n * (n - 1))))
    return num / math.sqrt(var)


_CUCCONI_CORE = """
    w AS (
        SELECT v, c0, c1, c0 + c1 AS cv,
               CAST(sum(c0 + c1) OVER (ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM h
    ),
    nn AS (
        SELECT CAST(sum(c0) AS BIGINT) AS n1,
               CAST(sum(c1) AS BIGINT) AS n2,
               CAST(sum(c0 + c1) AS BIGINT) AS n
        FROM h
    ),
    mr AS (
        SELECT v, c0, c1, cv,
               2 * (cum - cv) + cv + 1 AS m2
        FROM w
    )
"""


# --------------------------------------------------------- source_cucconi
def _cucconi_query():
    def q(sf_dir: str):
        h = _two_source_hist(sf_dir)
        c0 = h["c0"].to_numpy(np.int64)
        c1 = h["c1"].to_numpy(np.int64)
        u, v, c = cucconi_from_hist(c0, c1)
        return pa.table({
            "u_stat": pa.array([u], type=pa.float64()),
            "v_stat": pa.array([v], type=pa.float64()),
            "cucconi_c": pa.array([c], type=pa.float64()),
        })

    sql = f"""
    WITH {_SQL_HIST},
    {_CUCCONI_CORE},
    s AS (
        SELECT
            CAST(sum(c1 * m2 * m2) AS BIGINT) AS s2,
            CAST(sum(c1 * (2 * ((SELECT n FROM nn) + 1) - m2)
                     * (2 * ((SELECT n FROM nn) + 1) - m2))
                 AS BIGINT) AS s2c
        FROM mr
    ),
    uv AS (
        SELECT
            CAST(6 * s.s2 - 4 * nn.n2 * (nn.n + 1)
                 * (2 * nn.n + 1) AS DOUBLE) / 4.0e0
            / sqrt(CAST(nn.n1 * nn.n2 AS DOUBLE)
                   * CAST((nn.n + 1) * (2 * nn.n + 1) AS DOUBLE)
                   * CAST(8 * nn.n + 11 AS DOUBLE) / 5.0e0)
                AS u,
            CAST(6 * s.s2c - 4 * nn.n2 * (nn.n + 1)
                 * (2 * nn.n + 1) AS DOUBLE) / 4.0e0
            / sqrt(CAST(nn.n1 * nn.n2 AS DOUBLE)
                   * CAST((nn.n + 1) * (2 * nn.n + 1) AS DOUBLE)
                   * CAST(8 * nn.n + 11 AS DOUBLE) / 5.0e0)
                AS v,
            2.0e0 * CAST(nn.n * nn.n - 4 AS DOUBLE)
                / CAST((2 * nn.n + 1) * (8 * nn.n + 11)
                       AS DOUBLE) - 1.0e0 AS rho
        FROM s CROSS JOIN nn
    )
    SELECT u AS u_stat, v AS v_stat,
           (u * u + v * v - 2.0e0 * rho * u * v)
           / (2.0e0 * (1.0e0 - rho * rho)) AS cucconi_c
    FROM uv
    """
    return q, sql


# ---------------------------------------------------------- source_lepage
def _lepage_query():
    def q(sf_dir: str):
        h = _two_source_hist(sf_dir)
        c0 = h["c0"].to_numpy(np.int64)
        c1 = h["c1"].to_numpy(np.int64)
        zw = wilcoxon_z_from_hist(c0, c1)
        _, _, _, zab = ab_from_hist(c0, c1)
        lp = zw * zw + zab * zab
        return pa.table({
            "z_wilcoxon": pa.array([zw], type=pa.float64()),
            "z_ansari": pa.array([zab], type=pa.float64()),
            "lepage_l": pa.array([lp], type=pa.float64()),
        })

    # AB z CTEs copied verbatim from wave-180 (same spelling)
    sql = f"""
    WITH {_SQL_HIST},
    {_CUCCONI_CORE},
    wz AS (
        SELECT
            (CAST(CAST(sum(c0 * m2) AS BIGINT)
                  - (SELECT n1 FROM nn)
                    * ((SELECT n FROM nn) + 1) AS DOUBLE))
            / 2.0e0 AS num,
            CAST((SELECT n1 FROM nn) * (SELECT n2 FROM nn)
                 AS DOUBLE) / 12.0e0
            * (CAST((SELECT n FROM nn) + 1 AS DOUBLE)
               - CAST(CAST(sum(cv * cv * cv - cv) AS BIGINT)
                      AS DOUBLE)
                 / CAST((SELECT n FROM nn)
                        * ((SELECT n FROM nn) - 1) AS DOUBLE))
                AS var
        FROM mr
    ),
    nn2 AS (
        SELECT n1, n2, n,
               CASE WHEN n % 2 = 0
                    THEN (n // 2) * (n // 2 + 1)
                    ELSE ((n + 1) // 2) * ((n + 1) // 2)
               END AS tn
        FROM nn
    ),
    blocks AS (
        SELECT w.v, w.c0, w.cv,
               (CASE WHEN w.cum <= (nn2.n + 1) // 2
                     THEN w.cum * (w.cum + 1) // 2
                     ELSE nn2.tn - (nn2.n - w.cum)
                          * (nn2.n - w.cum + 1) // 2 END)
             - (CASE WHEN w.cum - w.cv <= (nn2.n + 1) // 2
                     THEN (w.cum - w.cv) * (w.cum - w.cv + 1) // 2
                     ELSE nn2.tn - (nn2.n - w.cum + w.cv)
                          * (nn2.n - w.cum + w.cv + 1) // 2 END)
                   AS s
        FROM w CROSS JOIN nn2
    ),
    folds AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list(CAST(c0 * s AS DOUBLE) / CAST(cv AS DOUBLE)
                     ORDER BY v)), (p, x) -> p + x) AS ab,
            list_reduce(list_prepend(0.0e0,
                list(CAST(s * s AS DOUBLE) / CAST(cv AS DOUBLE)
                     ORDER BY v)), (p, x) -> p + x) AS q
        FROM blocks
    ),
    zab AS (
        SELECT (folds.ab - CAST(nn2.n1 * nn2.tn AS DOUBLE)
                           / CAST(nn2.n AS DOUBLE))
               / sqrt(CAST(nn2.n1 * nn2.n2 AS DOUBLE)
                      * (CAST(nn2.n AS DOUBLE) * folds.q
                         - CAST(nn2.tn * nn2.tn AS DOUBLE))
                      / CAST(nn2.n * nn2.n * (nn2.n - 1)
                             AS DOUBLE)) AS z
        FROM folds CROSS JOIN nn2
    )
    SELECT wz.num / sqrt(wz.var) AS z_wilcoxon,
           zab.z AS z_ansari,
           (wz.num / sqrt(wz.var)) * (wz.num / sqrt(wz.var))
           + zab.z * zab.z AS lepage_l
    FROM wz CROSS JOIN zab
    """
    return q, sql


def build_wave197_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("source_cucconi",) + _cucconi_query()))
    add(*(("source_lepage",) + _lepage_query()))
    return queries, oracles
