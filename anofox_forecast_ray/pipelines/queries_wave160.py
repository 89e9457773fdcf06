"""Wave-160 queries: DFA exponent, Theil MSE decomposition.

- events_dfa: detrended fluctuation analysis of the hourly count
  series — the long-range-dependence exponent that complements the
  repo's R/S Hurst and Allan queries. The profile is EXACT up to
  one shared expression (P_t = C_t - t*mu with C_t an integer
  window cumsum and mu one division), each box's linear detrend
  uses closed-form coefficients over integer x-moments with
  t-ordered folds for S_p/S_xp and the residual sum, box RSS folds
  in box order, and the DFA exponent is a 4-point log-log slope
  (scalar lns).
- events_theil_decomposition: Theil's classic decomposition of the
  naive (persistence) forecast MSE into bias, variance and
  covariance shares, U_bias + U_var + U_cov = 1. All moments fold
  in t order; means/sds/corr spelled identically on both sides;
  the share identity is asserted in the brute.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .queries import _num_read_blocks
from ._scaffold import read_cols

US_PER_HOUR = 3_600_000_000
DFA_SIZES = [16, 32, 64, 128]


def _hourly(sf_dir: str):
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
    hmin, hmax = int(h["hour"].min()), int(h["hour"].max())
    cnt = np.zeros(hmax - hmin + 1, dtype=np.int64)
    cnt[h["hour"].to_numpy(np.int64) - hmin] = (
        h["cnt"].to_numpy(np.int64))
    return cnt


# ------------------------------------------------------------------ events_dfa
def _dfa_query(sizes=tuple(DFA_SIZES)):
    def q(sf_dir: str):
        y = [int(v) for v in _hourly(sf_dir)]
        n = len(y)
        sy = sum(y)
        mu = float(sy) / float(n)
        cum = []
        c = 0
        for v in y:
            c += v
            cum.append(c)
        prof = [float(cum[t]) - float(t + 1) * mu
                for t in range(n)]

        pts = []
        for ll in sizes:
            nb = n // ll
            sx = ll * (ll - 1) // 2
            sxx = (ll - 1) * ll * (2 * ll - 1) // 6
            den = ll * sxx - sx * sx
            tot = 0.0
            for k in range(nb):
                sp = 0.0
                sxp = 0.0
                for i in range(ll):
                    p = prof[k * ll + i]
                    sp = sp + p
                    sxp = sxp + float(i) * p
                b = (float(ll) * sxp - float(sx) * sp) \
                    / float(den)
                a = (sp * float(sxx) - float(sx) * sxp) \
                    / float(den)
                rss = 0.0
                for i in range(ll):
                    d = (prof[k * ll + i] - a) \
                        - (b * float(i))
                    rss = rss + d * d
                tot = tot + rss
            f2 = tot / float(nb * ll)
            pts.append((math.log(float(ll)),
                        math.log(math.sqrt(f2))))

        k = len(pts)
        kf = float(k)
        mx = 0.0
        my = 0.0
        for x, yv in pts:
            mx = mx + x
            my = my + yv
        mx = mx / kf
        my = my / kf
        sxy = 0.0
        sxx2 = 0.0
        for x, yv in pts:
            sxy = sxy + (x - mx) * (yv - my)
            sxx2 = sxx2 + (x - mx) * (x - mx)
        alpha = sxy / sxx2
        return pa.table({
            "n_hours": pa.array([n], type=pa.int64()),
            "f_16": pa.array([math.exp(pts[0][1])],
                             type=pa.float64()),
            "f_128": pa.array([math.exp(pts[3][1])],
                              type=pa.float64()),
            "alpha": pa.array([alpha], type=pa.float64()),
        })

    size_rows = ", ".join(f"({s})" for s in sizes)
    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS t,
               COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(cnt AS HUGEINT)) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE) AS mu
           FROM grid),
    prof AS MATERIALIZED (
        SELECT t,
               CAST(sum(cnt) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               - CAST(t + 1 AS DOUBLE) * nn.mu AS p
        FROM grid CROSS JOIN nn
    ),
    sizes AS (SELECT * FROM (VALUES {size_rows}) s(l)),
    boxes AS (
        SELECT s.l, prof.t // s.l AS k,
               prof.t % s.l AS i, prof.p
        FROM prof CROSS JOIN sizes s
        CROSS JOIN nn
        WHERE prof.t < (nn.n // s.l) * s.l
    ),
    fits AS (
        SELECT l, k,
               list_reduce(list_prepend(0.0e0,
                   list(p ORDER BY i)), (x, y) -> x + y)
                   AS sp,
               list_reduce(list_prepend(0.0e0,
                   list(CAST(i AS DOUBLE) * p ORDER BY i)),
                   (x, y) -> x + y) AS sxp
        FROM boxes GROUP BY l, k
    ),
    coefs AS (
        SELECT l, k,
               (CAST(l AS DOUBLE) * sxp
                - CAST(l * (l - 1) // 2 AS DOUBLE) * sp)
               / CAST(l * ((l - 1) * l * (2 * l - 1) // 6)
                      - (l * (l - 1) // 2)
                        * (l * (l - 1) // 2) AS DOUBLE)
                   AS b,
               (sp * CAST((l - 1) * l * (2 * l - 1) // 6
                          AS DOUBLE)
                - CAST(l * (l - 1) // 2 AS DOUBLE) * sxp)
               / CAST(l * ((l - 1) * l * (2 * l - 1) // 6)
                      - (l * (l - 1) // 2)
                        * (l * (l - 1) // 2) AS DOUBLE)
                   AS a
        FROM fits
    ),
    rss AS (
        SELECT bx.l, bx.k,
               list_reduce(list_prepend(0.0e0,
                   list(((bx.p - c.a)
                         - (c.b * CAST(bx.i AS DOUBLE)))
                        * ((bx.p - c.a)
                           - (c.b * CAST(bx.i AS DOUBLE)))
                        ORDER BY bx.i)),
                   (x, y) -> x + y) AS r
        FROM boxes bx
        JOIN coefs c ON c.l = bx.l AND c.k = bx.k
        GROUP BY bx.l, bx.k
    ),
    fl AS (
        SELECT l,
               ln(sqrt(
                   list_reduce(list_prepend(0.0e0,
                       list(r ORDER BY k)), (x, y) -> x + y)
                   / CAST((SELECT n FROM nn) // l * l
                          AS DOUBLE))) AS lnf,
               ln(CAST(l AS DOUBLE)) AS lnl
        FROM rss GROUP BY l
    ),
    mu2 AS (
        SELECT CAST(count(*) AS DOUBLE) AS kf,
               list_reduce(list_prepend(0.0e0,
                   list(lnl ORDER BY l)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS mx,
               list_reduce(list_prepend(0.0e0,
                   list(lnf ORDER BY l)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS my
        FROM fl
    ),
    slope AS (
        SELECT
            list_reduce(list_prepend(0.0e0,
                list((lnl - mu2.mx) * (lnf - mu2.my)
                     ORDER BY l)), (x, y) -> x + y)
            / list_reduce(list_prepend(0.0e0,
                list((lnl - mu2.mx) * (lnl - mu2.mx)
                     ORDER BY l)), (x, y) -> x + y) AS alpha
        FROM fl CROSS JOIN mu2
        GROUP BY mu2.mx, mu2.my
    )
    SELECT (SELECT n FROM nn) AS n_hours,
           exp((SELECT lnf FROM fl WHERE l = 16)) AS f_16,
           exp((SELECT lnf FROM fl WHERE l = 128)) AS f_128,
           slope.alpha AS alpha
    FROM slope
    """
    return q, sql


# ---------------------------------------------- events_theil_decomposition
def _theil_decomp_query():
    def q(sf_dir: str):
        y = [int(v) for v in _hourly(sf_dir)]
        a = y[1:]   # actual
        f = y[:-1]  # naive forecast
        n = len(a)
        nf = float(n)

        sa = sf_ = 0.0
        for i in range(n):
            sa = sa + float(a[i])
            sf_ = sf_ + float(f[i])
        ma = sa / nf
        mf = sf_ / nf
        va = vf = cov = mse = 0.0
        for i in range(n):
            da = float(a[i]) - ma
            df = float(f[i]) - mf
            va = va + da * da
            vf = vf + df * df
            cov = cov + da * df
            e = float(f[i]) - float(a[i])
            mse = mse + e * e
        va = va / nf
        vf = vf / nf
        cov = cov / nf
        mse = mse / nf
        sda = math.sqrt(va)
        sdf = math.sqrt(vf)
        r = cov / (sda * sdf)
        u_bias = ((mf - ma) * (mf - ma)) / mse
        u_var = ((sdf - sda) * (sdf - sda)) / mse
        u_cov = (2.0 * (1.0 - r) * sdf * sda) / mse
        return pa.table({
            "n_pairs": pa.array([n], type=pa.int64()),
            "mse": pa.array([mse], type=pa.float64()),
            "u_bias": pa.array([u_bias], type=pa.float64()),
            "u_var": pa.array([u_var], type=pa.float64()),
            "u_cov": pa.array([u_cov], type=pa.float64()),
        })

    sql = f"""
    WITH hc AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} AS hour,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    grid AS (
        SELECT CAST(row_number() OVER (ORDER BY g.h) - 1
                    AS BIGINT) AS t,
               COALESCE(hc.cnt, 0) AS cnt
        FROM (SELECT unnest(generate_series(
                  (SELECT min(hour) FROM hc),
                  (SELECT max(hour) FROM hc))) AS h) g
        LEFT JOIN hc ON hc.hour = g.h
    ),
    pairs AS (
        SELECT c.t - 1 AS i,
               CAST(c.cnt AS DOUBLE) AS a,
               CAST(p.cnt AS DOUBLE) AS f
        FROM grid c JOIN grid p ON p.t = c.t - 1
    ),
    mu AS (
        SELECT CAST(count(*) AS DOUBLE) AS nf,
               list_reduce(list_prepend(0.0e0,
                   list(a ORDER BY i)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS ma,
               list_reduce(list_prepend(0.0e0,
                   list(f ORDER BY i)), (x, y) -> x + y)
                   / CAST(count(*) AS DOUBLE) AS mf
        FROM pairs
    ),
    mom AS (
        SELECT mu.nf, mu.ma, mu.mf,
               list_reduce(list_prepend(0.0e0,
                   list((a - mu.ma) * (a - mu.ma)
                        ORDER BY i)), (x, y) -> x + y)
                   / mu.nf AS va,
               list_reduce(list_prepend(0.0e0,
                   list((f - mu.mf) * (f - mu.mf)
                        ORDER BY i)), (x, y) -> x + y)
                   / mu.nf AS vf,
               list_reduce(list_prepend(0.0e0,
                   list((a - mu.ma) * (f - mu.mf)
                        ORDER BY i)), (x, y) -> x + y)
                   / mu.nf AS cov,
               list_reduce(list_prepend(0.0e0,
                   list((f - a) * (f - a) ORDER BY i)),
                   (x, y) -> x + y) / mu.nf AS mse
        FROM pairs CROSS JOIN mu
        GROUP BY mu.nf, mu.ma, mu.mf
    )
    SELECT CAST(nf AS BIGINT) AS n_pairs,
           mse,
           ((mf - ma) * (mf - ma)) / mse AS u_bias,
           ((sqrt(vf) - sqrt(va)) * (sqrt(vf) - sqrt(va)))
               / mse AS u_var,
           (2.0e0 * (1.0e0 - cov / (sqrt(va) * sqrt(vf)))
            * sqrt(vf) * sqrt(va)) / mse AS u_cov
    FROM mom
    """
    return q, sql


def build_wave160_queries():
    queries = {}
    oracles = {}

    def add(name, q, sql=None):
        queries[name] = q
        if sql is not None:
            oracles[name] = sql

    add(*(("events_dfa",) + _dfa_query()))
    add(*(("events_theil_decomposition",)
          + _theil_decomp_query()))
    return queries, oracles
