"""Wave-267 queries: cross-ApEn and ANCOVA slope homogeneity.

events_cross_apen: cross-approximate entropy between the daily error
and purchase count series (asynchrony measure): with integer
tolerance r = IQR(pooled)//5 + 1 (the multiscale-entropy convention),
C_i^m counts j whose m-length purchase template stays within r of
the error template at i — all-integer comparisons — and
crossApEn = Φ2 − Φ3 with Φm the mean of ln(C_i/(n−m+1)) over the
i with C_i > 0 (no self-match exists across series; the zero-count
exclusion is mirrored as the same CASE/WHERE on both sides).

part_ancova_brand: the classic ANCOVA slope-homogeneity F test of
retail price (cents) on size across the five part brands — common-
slope RSS vs separate-slopes RSS from per-brand integer moment cores
(n·Sxx − Sx² etc.), folded in brand order.  The multi-group sequel
to part_chow_test.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

US_PER_DAY = 86_400_000_000


def cross_apen(e, p):
    """(n, r, n2_valid, n3_valid, cross_apen)."""
    n = len(e)
    pooled = sorted(e + p)
    m = len(pooled)
    q1 = pooled[(m + 3) // 4 - 1]
    q3 = pooled[(3 * m + 3) // 4 - 1]
    r = (q3 - q1) // 5 + 1

    def phi(mm):
        cnt_n = n - mm + 1
        s = 0.0
        valid = 0
        for i in range(cnt_n):
            c = 0
            for j in range(cnt_n):
                ok = True
                for k in range(mm):
                    if abs(e[i + k] - p[j + k]) > r:
                        ok = False
                        break
                if ok:
                    c += 1
            if c > 0:
                valid += 1
                s = s + math.log(float(c) / float(cnt_n))
        if valid == 0:          # no cross-matches at this scale
            return 0, 0.0
        return valid, s / float(valid)

    v2, phi2 = phi(2)
    v3, phi3 = phi(3)
    return n, r, v2, v3, phi2 - phi3


def ancova_brand(groups):
    """(k, n, f_slopes) from {brand: (n, sx, sy, sxx, sxy, syy)}."""
    k = len(groups)
    n_tot = 0
    exx = exy = eyy = 0.0
    rss_sep = 0.0
    for b in sorted(groups):
        ng, sx, sy, sxx, sxy, syy = groups[b]
        n_tot += ng
        fx = float(ng * sxx - sx * sx) / float(ng)
        fxy = float(ng * sxy - sx * sy) / float(ng)
        fy = float(ng * syy - sy * sy) / float(ng)
        exx = exx + fx
        exy = exy + fxy
        eyy = eyy + fy
        rss_sep = rss_sep + (fy - fxy * fxy / fx)
    rss_common = eyy - exy * exy / exx
    f = (((rss_common - rss_sep) / (float(k) - 1.0))
         / (rss_sep / (float(n_tot) - 2.0 * float(k))))
    return k, n_tot, f


# -------------------------------------------------- events_cross_apen
def _cross_apen_query():
    def q(sf_dir: str):
        from .queries_wave207 import _daily_ep

        e, p = _daily_ep(sf_dir)
        n, r, v2, v3, ca = cross_apen(
            [int(v) for v in e], [int(v) for v in p])
        return pa.table({
            "n_days": pa.array([n], type=pa.int64()),
            "tolerance": pa.array([r], type=pa.int64()),
            "n2_valid": pa.array([v2], type=pa.int64()),
            "n3_valid": pa.array([v3], type=pa.int64()),
            "cross_apen": pa.array([ca], type=pa.float64()),
        })

    sql = f"""
    WITH ev AS (
        SELECT epoch_us(ts) // {US_PER_DAY} AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
                   AS is_e,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS is_p
        FROM events
    ),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
    grid AS (
        SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                   AS day
        FROM span
    ),
    d AS (
        SELECT g.day - (SELECT lo FROM span) AS i,
               CAST(coalesce(c.e, 0) AS BIGINT) AS e,
               CAST(coalesce(c.p, 0) AS BIGINT) AS p
        FROM grid g LEFT JOIN (
            SELECT day, sum(is_e) AS e, sum(is_p) AS p
            FROM ev GROUP BY day
        ) c ON g.day = c.day
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    pooled AS (
        SELECT v, row_number() OVER (ORDER BY v) AS rk,
               count(*) OVER () AS m
        FROM (SELECT e AS v FROM d UNION ALL SELECT p FROM d)
    ),
    tol AS (
        SELECT ((SELECT v FROM pooled
                 WHERE rk = (3 * m + 3) // 4 LIMIT 1)
                - (SELECT v FROM pooled
                   WHERE rk = (m + 3) // 4 LIMIT 1)) // 5 + 1
                   AS r
    ),
    c2 AS (
        SELECT a.i,
               CAST(sum(CASE WHEN abs(a.e - b.p)
                                  <= (SELECT r FROM tol)
                              AND abs(a2.e - b2.p)
                                  <= (SELECT r FROM tol)
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM d a JOIN d a2 ON a2.i = a.i + 1
        CROSS JOIN d b JOIN d b2 ON b2.i = b.i + 1
        WHERE b.i < (SELECT n FROM nn) - 1
          AND a.i < (SELECT n FROM nn) - 1
        GROUP BY a.i
    ),
    c3 AS (
        SELECT a.i,
               CAST(sum(CASE WHEN abs(a.e - b.p)
                                  <= (SELECT r FROM tol)
                              AND abs(a2.e - b2.p)
                                  <= (SELECT r FROM tol)
                              AND abs(a3.e - b3.p)
                                  <= (SELECT r FROM tol)
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM d a JOIN d a2 ON a2.i = a.i + 1
        JOIN d a3 ON a3.i = a.i + 2
        CROSS JOIN d b JOIN d b2 ON b2.i = b.i + 1
        JOIN d b3 ON b3.i = b.i + 2
        WHERE b.i < (SELECT n FROM nn) - 2
          AND a.i < (SELECT n FROM nn) - 2
        GROUP BY a.i
    ),
    phi2 AS (
        SELECT CAST(count(*) AS BIGINT) AS v,
               CASE WHEN count(*) = 0 THEN 0.0e0
                    ELSE list_reduce(list_prepend(0.0e0,
                   list(ln(CAST(c AS DOUBLE)
                           / CAST((SELECT n FROM nn) - 1
                                  AS DOUBLE)) ORDER BY i)),
                   (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) END AS ph
        FROM c2 WHERE c > 0
    ),
    phi3 AS (
        SELECT CAST(count(*) AS BIGINT) AS v,
               CASE WHEN count(*) = 0 THEN 0.0e0
                    ELSE list_reduce(list_prepend(0.0e0,
                   list(ln(CAST(c AS DOUBLE)
                           / CAST((SELECT n FROM nn) - 2
                                  AS DOUBLE)) ORDER BY i)),
                   (a, b) -> a + b)
               / CAST(count(*) AS DOUBLE) END AS ph
        FROM c3 WHERE c > 0
    )
    SELECT (SELECT n FROM nn) AS n_days,
           (SELECT CAST(r AS BIGINT) FROM tol) AS tolerance,
           phi2.v AS n2_valid,
           phi3.v AS n3_valid,
           phi2.ph - phi3.ph AS cross_apen
    FROM phi2 CROSS JOIN phi3
    """
    return q, sql


# -------------------------------------------------- part_ancova_brand
def _ancova_query():
    def q(sf_dir: str):
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_brand", "p_size", "p_retailprice"])
        brand = t.column("p_brand").to_pylist()
        size = [int(v) for v in t.column("p_size").to_pylist()]
        cents = np.round(
            t.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        groups = {}
        for b, x, y in zip(brand, size, cents):
            g = groups.setdefault(b, [0, 0, 0, 0, 0, 0])
            y = int(y)
            g[0] += 1
            g[1] += x
            g[2] += y
            g[3] += x * x
            g[4] += x * y
            g[5] += y * y
        k, n, f = ancova_brand(
            {b: tuple(v) for b, v in groups.items()})
        return pa.table({
            "n_brands": pa.array([k], type=pa.int64()),
            "n_parts": pa.array([n], type=pa.int64()),
            "f_slopes": pa.array([f], type=pa.float64()),
        })

    sql = """
    WITH base AS (
        SELECT p_brand AS b, CAST(p_size AS BIGINT) AS x,
               CAST(round_even(p_retailprice * 100, 0) AS BIGINT)
                   AS y
        FROM part
    ),
    g AS (
        SELECT b,
               CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                   AS syy
        FROM base GROUP BY b
    ),
    per AS (
        SELECT b, ng,
               CAST(ng * sxx - sx * sx AS DOUBLE)
                   / CAST(ng AS DOUBLE) AS fx,
               CAST(ng * sxy - sx * sy AS DOUBLE)
                   / CAST(ng AS DOUBLE) AS fxy,
               CAST(CAST(ng AS HUGEINT) * syy
                    - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                   / CAST(ng AS DOUBLE) AS fy
        FROM g
    ),
    folds AS (
        SELECT
            CAST(count(*) AS BIGINT) AS k,
            CAST(sum(ng) AS BIGINT) AS n,
            list_reduce(list_prepend(0.0e0,
                list(fx ORDER BY b)), (a, c) -> a + c) AS exx,
            list_reduce(list_prepend(0.0e0,
                list(fxy ORDER BY b)), (a, c) -> a + c) AS exy,
            list_reduce(list_prepend(0.0e0,
                list(fy ORDER BY b)), (a, c) -> a + c) AS eyy,
            list_reduce(list_prepend(0.0e0,
                list(fy - fxy * fxy / fx ORDER BY b)),
                (a, c) -> a + c) AS rss_sep
        FROM per
    )
    SELECT k AS n_brands,
           n AS n_parts,
           (((eyy - exy * exy / exx) - rss_sep)
            / (CAST(k AS DOUBLE) - 1.0))
           / (rss_sep / (CAST(n AS DOUBLE)
                         - 2.0 * CAST(k AS DOUBLE))) AS f_slopes
    FROM folds
    """
    return q, sql


def build_wave267_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_cross_apen",) + _cross_apen_query()))
    add(*(("part_ancova_brand",) + _ancova_query()))
    return queries, oracles
