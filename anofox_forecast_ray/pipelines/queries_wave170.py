"""Wave-170 queries: deterministic RANSAC, Deming regression.

- part_ransac_fit: RANSAC line fit of retail cents on part size,
  made fully replayable: the 20 candidate point-pairs come from
  deterministic sha256 index draws (the repo's seeded-randomness
  convention), the inlier test |y - (a + b x)| <= 2000 cents uses
  exact integer cross-multiplication (b is a ratio of integers, so
  the test is |y*dx - (a_num + dy*x)| style — no float in the
  VOTE), the winner takes (inliers desc, trial asc), and the final
  OLS refit on the winning inlier set uses HUGEINT moments.
- part_deming_fit: Deming errors-in-variables regression (delta=1)
  of retail cents on size — the measurement-error-aware slope
  b = (Syy - Sxx + sqrt((Syy-Sxx)^2 + 4 Sxy^2)) / (2 Sxy) from
  centered integer moment combinations, one sqrt — extreme here
  because the variances differ by 1e10 (documented), so the
  standardized-major-axis slope sign(Sxy) sqrt(Syy/Sxx) (Deming
  with delta = variance ratio) is reported as the
  scale-appropriate EIV estimate next to plain OLS.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks

RS_TRIALS = 20
RS_TOL = 2000  # cents


# ---------------------------------------------------------- part_ransac_fit
def _ransac_query(trials: int = RS_TRIALS, tol: int = RS_TOL):
    def q(sf_dir: str):
        import ray.data as rd

        pt = rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_size", "p_retailprice"]
        ).to_pandas().sort_values("p_partkey")
        x = pt["p_size"].to_numpy(np.int64)
        y = np.round(pt["p_retailprice"].to_numpy()
                     * 100.0).astype(np.int64)
        n = len(pt)

        best = None  # (inliers, trial, i, j)
        for t_i in range(trials):
            hi = int(hashlib.sha256(
                f"ransac-a-{t_i}".encode()).hexdigest()[:15],
                16) % n
            hj = int(hashlib.sha256(
                f"ransac-b-{t_i}".encode()).hexdigest()[:15],
                16) % n
            if x[hi] == x[hj]:
                continue
            dx = int(x[hj]) - int(x[hi])
            dy = int(y[hj]) - int(y[hi])
            # inlier: |(y - y_i)*dx - dy*(x - x_i)| <= tol*|dx|
            lhs = np.abs((y - int(y[hi]))
                         * dx - dy * (x - int(x[hi])))
            cnt = int((lhs <= tol * abs(dx)).sum())
            key = (-cnt, t_i)
            if best is None or key < best[0]:
                best = (key, hi, hj, dx, dy)
        _key, hi, hj, dx, dy = best
        cnt = -_key[0]
        trial = _key[1]
        lhs = np.abs((y - int(y[hi]))
                     * dx - dy * (x - int(x[hi])))
        mask = lhs <= tol * abs(dx)
        xs = [int(v) for v in x[mask]]
        ys = [int(v) for v in y[mask]]
        k = len(xs)
        sx = sum(xs)
        sy = sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(a * b for a, b in zip(xs, ys))
        den = k * sxx - sx * sx
        b = float(k * sxy - sx * sy) / float(den)
        a = float(sy * sxx - sx * sxy) / float(den)
        return pa.table({
            "best_trial": pa.array([trial],
                                   type=pa.int64()),
            "inliers": pa.array([cnt], type=pa.int64()),
            "slope": pa.array([b], type=pa.float64()),
            "intercept": pa.array([a], type=pa.float64()),
        })

    trial_rows = ", ".join(f"({t})" for t in range(trials))
    sql = f"""
    WITH p AS (
        SELECT p_partkey AS pk,
               CAST(p_size AS BIGINT) AS x,
               CAST(round_even(p_retailprice * 100, 0)
                    AS BIGINT) AS y,
               CAST(row_number() OVER (ORDER BY p_partkey)
                    - 1 AS BIGINT) AS idx
        FROM part
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p),
    tr AS (
        SELECT t.t,
               CAST(concat('0x', substr(sha256(
                   concat('ransac-a-', CAST(t.t AS VARCHAR))),
                   1, 15)) AS BIGINT) % nn.n AS ia,
               CAST(concat('0x', substr(sha256(
                   concat('ransac-b-', CAST(t.t AS VARCHAR))),
                   1, 15)) AS BIGINT) % nn.n AS ib
        FROM (SELECT * FROM (VALUES {trial_rows}) v(t)) t
        CROSS JOIN nn
    ),
    cand AS (
        SELECT tr.t, a.x AS xi, a.y AS yi,
               b.x - a.x AS dx, b.y - a.y AS dy
        FROM tr
        JOIN p a ON a.idx = tr.ia
        JOIN p b ON b.idx = tr.ib
        WHERE b.x <> a.x
    ),
    votes AS (
        SELECT c.t,
               CAST(count(*) AS BIGINT) AS inl
        FROM cand c JOIN p ON TRUE
        WHERE abs((p.y - c.yi) * c.dx
                  - c.dy * (p.x - c.xi))
              <= {tol} * abs(c.dx)
        GROUP BY c.t
    ),
    best AS (
        SELECT v.t, v.inl, c.xi, c.yi, c.dx, c.dy
        FROM votes v JOIN cand c ON c.t = v.t
        ORDER BY v.inl DESC, v.t ASC LIMIT 1
    ),
    fit AS (
        SELECT best.t, best.inl,
               CAST(count(*) AS HUGEINT) AS k,
               CAST(sum(CAST(p.x AS HUGEINT)) AS HUGEINT)
                   AS sx,
               CAST(sum(CAST(p.y AS HUGEINT)) AS HUGEINT)
                   AS sy,
               CAST(sum(CAST(p.x AS HUGEINT) * p.x)
                    AS HUGEINT) AS sxx,
               CAST(sum(CAST(p.x AS HUGEINT) * p.y)
                    AS HUGEINT) AS sxy
        FROM best JOIN p ON abs((p.y - best.yi) * best.dx
                  - best.dy * (p.x - best.xi))
              <= {tol} * abs(best.dx)
        GROUP BY best.t, best.inl
    )
    SELECT CAST(t AS BIGINT) AS best_trial,
           inl AS inliers,
           CAST(k * sxy - sx * sy AS DOUBLE)
               / CAST(k * sxx - sx * sx AS DOUBLE) AS slope,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
               / CAST(k * sxx - sx * sx AS DOUBLE)
               AS intercept
    FROM fit
    """
    return q, sql


# ---------------------------------------------------------- part_deming_fit
def _deming_query():
    def q(sf_dir: str):
        import ray.data as rd

        pt = rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_size", "p_retailprice"]
        ).to_pandas()
        xs = [int(v) for v in pt["p_size"]]
        ys = [int(round(v * 100.0))
              for v in pt["p_retailprice"]]
        n = len(xs)
        nf = float(n)
        sx = sum(xs)
        sy = sum(ys)
        sxx = sum(v * v for v in xs)
        syy = sum(v * v for v in ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        cxx = (float(n * sxx - sx * sx)) / nf
        cyy = (float(n * syy - sy * sy)) / nf
        cxy = (float(n * sxy - sx * sy)) / nf
        b_dem = ((cyy - cxx)
                 + math.sqrt((cyy - cxx) * (cyy - cxx)
                             + 4.0 * (cxy * cxy))) \
            / (2.0 * cxy)
        b_ols = cxy / cxx
        a_dem = (float(sy) / nf) - b_dem * (float(sx) / nf)
        # standardized major axis (geometric-mean regression):
        # Deming with delta = var ratio — scale-appropriate here
        sgn = 1.0 if cxy >= 0.0 else -1.0
        b_sma = sgn * math.sqrt(cyy / cxx)
        return pa.table({
            "n_parts": pa.array([n], type=pa.int64()),
            "slope_deming": pa.array([b_dem],
                                     type=pa.float64()),
            "slope_sma": pa.array([b_sma],
                                  type=pa.float64()),
            "slope_ols": pa.array([b_ols],
                                  type=pa.float64()),
            "intercept_deming": pa.array([a_dem],
                                         type=pa.float64()),
        })

    sql = """
    WITH p AS (
        SELECT CAST(p_size AS BIGINT) AS x,
               CAST(round_even(p_retailprice * 100, 0)
                    AS BIGINT) AS y
        FROM part
    ),
    mom AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
               CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS sxx,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT)
                   AS syy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                   AS sxy
        FROM p
    ),
    cen AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * sxx - sx * sx AS DOUBLE)
                   / CAST(n AS DOUBLE) AS cxx,
               CAST(n * syy - sy * sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS cyy,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n AS DOUBLE) AS cxy,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
        FROM mom
    )
    SELECT n AS n_parts,
           ((cyy - cxx) + sqrt((cyy - cxx) * (cyy - cxx)
                               + 4.0e0 * (cxy * cxy)))
               / (2.0e0 * cxy) AS slope_deming,
           (CASE WHEN cxy >= 0.0e0 THEN 1.0e0
                 ELSE -1.0e0 END) * sqrt(cyy / cxx)
               AS slope_sma,
           cxy / cxx AS slope_ols,
           my - (((cyy - cxx)
                  + sqrt((cyy - cxx) * (cyy - cxx)
                         + 4.0e0 * (cxy * cxy)))
                 / (2.0e0 * cxy)) * mx AS intercept_deming
    FROM cen
    """
    return q, sql


def build_wave170_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("part_ransac_fit",) + _ransac_query()))
    add(*(("part_deming_fit",) + _deming_query()))
    return queries, oracles
